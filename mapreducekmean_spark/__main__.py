"""``python -m mapreducekmean_spark`` — the reference's CLI driver
(``java KMeans <k> <hdfs> <input> <output>``,
``/root/reference/src/KMeans.java:152``), Spark-native."""

from mapreducekmean_spark.cli import main

raise SystemExit(main())
