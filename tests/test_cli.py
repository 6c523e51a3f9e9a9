"""CLI parity (SURVEY.md §2.1 R15): the reference's driver surface as
``python -m mapreducekmean_spark``."""

from __future__ import annotations

import subprocess
import sys


def _write_points(path, pts):
    path.write_text("".join(f"{x},{y}\n" for x, y in pts))


def test_cli_end_to_end(tmp_path):
    """Two obvious clusters; the CLI must converge, print the reference's
    report format, and write the reference's text sink format."""
    src = tmp_path / "pts.csv"
    _write_points(
        src,
        [(0.0, 0.0), (0.1, 0.0), (0.0, 0.1), (10.0, 10.0), (10.1, 10.0), (10.0, 10.1)],
    )
    out = tmp_path / "out"
    res = subprocess.run(
        [
            sys.executable,
            "-m",
            "mapreducekmean_spark",
            "2",
            str(src),
            str(out),
            "--archive",
            str(tmp_path / "arch"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "Iteration finished at iter:" in res.stdout
    assert "Converged: true" in res.stdout
    assert "Centriod.0" in res.stdout and "Centriod.1" in res.stdout

    lines = sorted(
        ln
        for p in out.iterdir()
        if p.name.startswith("part-")
        for ln in p.read_text().splitlines()
    )
    assert len(lines) == 2
    cents = {}
    for ln in lines:
        cid, coords = ln.split("\t")
        cents[int(cid)] = [float(v) for v in coords.split(", ")]
    got = sorted(cents.values())
    assert abs(got[0][0] - 0.0333333) < 1e-3 and abs(got[1][0] - 10.0333333) < 1e-3

    arch = tmp_path / "arch"
    assert any(d.name.startswith("iteration=") for d in arch.iterdir())


def test_cli_usage_error():
    res = subprocess.run(
        [sys.executable, "-m", "mapreducekmean_spark", "2"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode != 0
    assert "usage" in (res.stderr + res.stdout).lower()
