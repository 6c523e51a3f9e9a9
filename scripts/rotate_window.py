"""Generate the round-start check-window rotation for contract.py.

The external driver checks only the FIRST 50 registry entries each round
(it writes one CORRECTNESS_r{N}.json row per checked query).  The
rotation that keeps every declared query's driver evidence fresh used to
be a hand-edited 70-line tuple; this script derives it mechanically from
the checked-in artifacts, so a round-start rotation is a generated diff.

Rules (the same ones the hand rotations of rounds 10-13 followed):

* A query is a *rotation candidate* iff it has no row in the LATEST
  CORRECTNESS artifact (i.e. the driver did not check it last round).
* Candidates are prioritised by evidence quality, worst first:
    1. never value-hash green (brand-new declarations that have no
       driver row at all, and rows-only queries such as ``kmeans_mllib``
       whose last any-row check has aged out) — ordered by their last
       any-row vintage (oldest first; never-checked last, in registry
       order);
    2. everything else by last value-hash-green vintage ascending
       (oldest evidence first), ties broken by key order inside that
       vintage's artifact (= the registry order the driver saw).
* The top 50 candidates become ``_CHECK_FIRST`` (the next window).
  Overflow candidates carry mid-registry one more round — the rotation
  tripwire (tests/test_contract.py) truncates the stale list to its
  first 50 entries in registry order, so anything past the window rides
  the truncation; this script prints the carried names and their
  vintages so the cap-trade is explicit, and FAILS (exit 1) if any
  carried entry would be more than ``--max-carry-age`` rounds stale by
  the time the next artifact lands.
* ``_STALE_OK`` / ``_CHECK_LAST`` become the value-hash-green subset of
  the latest artifact, in artifact key order: those entries stay within
  the tripwire's last-two-artifacts bound both now (latest-1/latest) and
  after the next artifact lands (latest/latest+1), so the suite is green
  across the whole round.

Run from the repo root at round start::

    python scripts/rotate_window.py          # prints the three tuples
    python scripts/rotate_window.py --check  # exit 1 if contract.py drifted

``tests/test_contract.py::test_rotation_matches_generator`` runs the
``--check`` logic in-process on every pytest run, restricted to queries
that existed at rotation time (mid-round declarations legitimately sit
mid-registry until the next round's rotation adopts them — see the
MID-REGISTRY NOTE in contract.py).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

WINDOW = 50

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_artifacts(repo: str = _REPO) -> dict[int, dict]:
    """All CORRECTNESS_r*.json keyed by round number, ascending."""
    out: dict[int, dict] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return dict(sorted(out.items()))


def _is_green(row: dict) -> bool:
    return bool(row.get("hash_match")) and not row.get("err")


def _is_any(row: dict) -> bool:
    return not row.get("err")


def vintages(artifacts: dict[int, dict]) -> tuple[dict, dict, dict]:
    """Per query: last hash-green round, last any-row round, and the key
    position inside that round's artifact (driver check order)."""
    green: dict[str, int] = {}
    anyrow: dict[str, int] = {}
    pos: dict[tuple[str, int], int] = {}
    for rnd, art in artifacts.items():
        for i, (name, row) in enumerate(art.items()):
            pos[(name, rnd)] = i
            if _is_any(row):
                anyrow[name] = rnd
            if _is_green(row):
                green[name] = rnd
    return green, anyrow, pos


def rotate(
    declared: list[str], artifacts: dict[int, dict]
) -> tuple[list[str], list[str], list[str]]:
    """Return (_CHECK_FIRST, _STALE_OK, _CHECK_LAST) plus carried
    overflow via :func:`carried`."""
    if not artifacts:
        return declared[:WINDOW], [], []
    latest_round = max(artifacts)
    latest = artifacts[latest_round]
    green, anyrow, pos = vintages(artifacts)
    reg_pos = {n: i for i, n in enumerate(declared)}

    candidates = [n for n in declared if n not in latest]

    def key(n: str):
        g = green.get(n)
        if g is None:
            # bucket 0: never value-hash green. Rows-only queries with a
            # stale any-row check lead (oldest row first); never-checked
            # declarations follow in registry order.
            a = anyrow.get(n)
            return (0, 0 if a is not None else 1, a or 0, reg_pos[n])
        return (1, g, pos[(n, g)], reg_pos[n])

    candidates.sort(key=key)
    check_first = candidates[:WINDOW]
    greens_latest = [n for n, row in latest.items() if _is_green(row)]
    return check_first, greens_latest, greens_latest


def carried(
    declared: list[str], artifacts: dict[int, dict]
) -> list[tuple[str, int | None]]:
    """Overflow candidates that did not fit the window, with their last
    hash-green vintage (None = never)."""
    check_first, _, _ = rotate(declared, artifacts)
    latest = artifacts[max(artifacts)]
    green, _, _ = vintages(artifacts)
    chosen = set(check_first)
    return [
        (n, green.get(n))
        for n in declared
        if n not in latest and n not in chosen
    ]


def _declared_names() -> list[str]:
    sys.path.insert(0, _REPO)
    from mapreducekmean_spark import contract

    return list(contract.registry())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--check", action="store_true", help="verify contract.py matches")
    ap.add_argument(
        "--write",
        action="store_true",
        help="rewrite the three tuples in contract.py in place (the "
        "round-start rotation as a generated diff)",
    )
    ap.add_argument(
        "--max-carry-age",
        type=int,
        default=4,
        help="fail if a carried entry's green evidence would be older than "
        "this many rounds once the next artifact lands",
    )
    args = ap.parse_args()

    artifacts = load_artifacts()
    if not artifacts:
        print("no CORRECTNESS_r*.json artifacts — nothing to rotate")
        return 0
    declared = _declared_names()
    latest_round = max(artifacts)
    check_first, stale_ok, check_last = rotate(declared, artifacts)
    carry = carried(declared, artifacts)

    if args.check:
        from mapreducekmean_spark import contract

        ok = True
        if list(contract._CHECK_FIRST) != check_first:
            print("_CHECK_FIRST drifted from generator output:")
            print("  expected:", check_first)
            print("  actual:  ", list(contract._CHECK_FIRST))
            ok = False
        if list(contract._STALE_OK) != stale_ok:
            print("_STALE_OK drifted from generator output")
            ok = False
        if list(contract._CHECK_LAST) != check_last:
            print("_CHECK_LAST drifted from generator output")
            ok = False
        print("rotation matches generator" if ok else "ROTATION DRIFT")
        return 0 if ok else 1

    if args.write:
        contract_path = os.path.join(
            _REPO, "mapreducekmean_spark", "contract.py"
        )
        with open(contract_path) as f:
            src = f.read()

        def tuple_block(name: str, names: list[str], comment: str) -> str:
            body = "".join(f'    "{n}",\n' for n in names)
            return f"{name} = (\n{comment}{body})\n"

        gen_note = (
            f"    # ROUND-{latest_round + 1} ROTATION — GENERATED by\n"
            f"    # scripts/rotate_window.py --write from\n"
            f"    # CORRECTNESS_r01..r{latest_round:02d} (verify with "
            f"--check; pytest twin:\n"
            f"    # tests/test_contract.py::"
            f"test_rotation_matches_generator). Rules in the\n"
            f"    # script docstring; carried overflow rides the\n"
            f"    # stale-list truncation mid-registry and leads the\n"
            f"    # round-{latest_round + 2} window.\n"
        )
        for name, names_list, comment in (
            ("_CHECK_FIRST", check_first, gen_note),
            ("_STALE_OK", stale_ok, ""),
            ("_CHECK_LAST", check_last, ""),
        ):
            pat = re.compile(rf"^{name} = \(\n.*?^\)\n", re.S | re.M)
            if not pat.search(src):
                print(f"cannot find {name} block in contract.py")
                return 1
            src = pat.sub(
                tuple_block(name, names_list, comment).replace(
                    "\\", "\\\\"
                ),
                src,
                count=1,
            )
        with open(contract_path, "w") as f:
            f.write(src)
        print(
            f"wrote ROUND-{latest_round + 1} rotation into contract.py "
            f"({len(check_first)} window / {len(stale_ok)} stale-ok / "
            f"{len(carry)} carried)"
        )
        return 0

    print(f"# ROUND-{latest_round + 1} ROTATION (generated by scripts/rotate_window.py")
    print(f"# from CORRECTNESS_r01..r{latest_round:02d}; window={WINDOW}).")
    print("_CHECK_FIRST = (")
    for n in check_first:
        print(f'    "{n}",')
    print(")")
    print("\n_STALE_OK = (")
    for n in stale_ok:
        print(f'    "{n}",')
    print(")")
    print("\n_CHECK_LAST = (")
    for n in check_last:
        print(f'    "{n}",')
    print(")")

    if carry:
        print(f"\n# CARRIED mid-registry ({len(carry)} candidates past the window):",
              file=sys.stderr)
        worst = 0
        for n, g in carry:
            age_next = (latest_round + 1) - (g if g is not None else latest_round + 1)
            worst = max(worst, age_next)
            print(f"#   {n}: last hash-green r{g} (age {age_next} at r{latest_round + 1})",
                  file=sys.stderr)
        if worst > args.max_carry_age:
            print(
                f"ERROR: carried evidence would be {worst} rounds old at "
                f"r{latest_round + 1} (> --max-carry-age {args.max_carry_age})",
                file=sys.stderr,
            )
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
