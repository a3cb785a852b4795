"""Isolated min-of-3 per-entry measurement, bench-harness-alike.

Usage:
    python /tmp/r15/measure_entries.py <repo_root> <sf_dir> <cpus> name1 name2 ...

Prints one JSON line {name: {"min": s, "med": s, "runs": [...]}}.
Matches bench.py methodology: local[cpus], shuffle.partitions=cpus,
AQE on, warm JVM + Python worker pools, clearCache between runs,
noop sink.
"""
import json
import os
import sys
import time


def main():
    repo = os.path.abspath(sys.argv[1])
    sf_dir = sys.argv[2]
    cpus = int(sys.argv[3])
    names = sys.argv[4:]
    sys.path.insert(0, repo)
    os.environ.setdefault("PYTHONPATH", repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r15-measure")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _warm(batches):
        import numpy  # noqa
        import pandas  # noqa
        yield from batches

    spark.range(10_000).repartition(cpus).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def _warm_rdd(part):
        from basenine_spark.bfl import parse as _parse
        from basenine_spark.bfl.pyeval import eval_query as _eval
        _eval(_parse("x == 1"), '{"x": 1}')
        return part

    spark.sparkContext.parallelize(range(cpus * 4), cpus).mapPartitions(
        _warm_rdd
    ).count()

    from basenine_spark.registry import SPARK_QUERIES

    out = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        srt = sorted(runs)
        out[name] = {"min": srt[0], "med": srt[1], "runs": runs}
        print(f"## {name}: min={srt[0]} med={srt[1]} runs={runs}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
