"""A/B harness for per-query fixed-overhead experiments.

Runs the bench.py headline suite with a JSON dict of extra Spark confs
taken from $SPARK_GRAFT_AB_CONF, printing the same one-line JSON as
bench.py plus the conf that was applied. Each invocation is a fresh
JVM, so confs that must be set before launch (driver memory, etc.)
take effect.

Usage:
    SPARK_GRAFT_AB_CONF='{"spark.sql.shuffle.partitions":"8"}' \
        python tools/bench_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F

from kamu_cli_spark.session import get_spark
from bench import HEADLINE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    conf = json.loads(os.environ.get("SPARK_GRAFT_AB_CONF", "{}"))
    only = os.environ.get("SPARK_GRAFT_AB_ONLY", "")
    names = [n for n in only.split(",") if n] or HEADLINE
    spark = get_spark(app_name="kamu-cli-spark-ab", extra_conf=conf)

    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(
        10_000
    ).write.mode("overwrite").format("noop").save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    queries = entry.queries()
    times: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        times[name] = round(best, 3)

    print(
        json.dumps(
            {
                "total": round(sum(times.values()), 3),
                "queries": times,
                "conf": conf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
