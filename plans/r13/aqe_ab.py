"""Interleaved A/B of spark.sql.adaptive.coalescePartitions.parallelismFirst
within ONE session (runtime-settable SQL conf): for each query, alternate
false/true runs so host drift hits both arms equally. Prints per-query
medians and the calibration probe."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from convex_batch_processor_spark.queries import QUERIES  # noqa: E402
from convex_batch_processor_spark.session import get_spark  # noqa: E402
from tests.benchlib import SCAN_CONF, median, warm_up  # noqa: E402

NAMES = sys.argv[1].split(",")
RUNS = int(os.environ.get("AB_RUNS", "3"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="aqe-ab", extra_conf=SCAN_CONF)
warm_up(spark)

def cal():
    t0 = time.monotonic()
    spark.range(200_000_000).selectExpr("sum(cast(id as double) * id) as s").collect()
    return round(time.monotonic() - t0, 3)

def run_once(fn):
    t0 = time.monotonic()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt

print(json.dumps({"cal_start": cal()}))
out = {}
for name in NAMES:
    fn = QUERIES[name].fn
    samples = {"false": [], "true": []}
    for _ in range(RUNS):
        for arm in ("false", "true"):
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.parallelismFirst", arm
            )
            samples[arm].append(run_once(fn))
    out[name] = {
        "false": round(median(samples["false"]), 3),
        "true": round(median(samples["true"]), 3),
    }
    print(json.dumps({name: out[name]}), flush=True)
print(json.dumps({"cal_end": cal(), "results": out}))
