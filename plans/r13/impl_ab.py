"""One-session interleaved A/B of old (r12 HEAD) vs new (working tree)
query implementations — immune to the host's cross-process speed
scatter. Usage: python plans/r13/impl_ab.py q1,q2,...  (queries must
exist in both plans/r13/old_impls.OLD and the live registry)."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from convex_batch_processor_spark.queries import QUERIES  # noqa: E402
from convex_batch_processor_spark.session import get_spark  # noqa: E402
from tests.benchlib import SCAN_CONF, median, warm_up  # noqa: E402

sys.path.insert(0, "/root/repo/plans/r13")
from old_impls import OLD  # noqa: E402

NAMES = sys.argv[1].split(",")
RUNS = int(os.environ.get("AB_RUNS", "3"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app_name="impl-ab", extra_conf=SCAN_CONF)
warm_up(spark)

def cal():
    xs = []
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(200_000_000).selectExpr(
            "sum(cast(id as double) * id) as s"
        ).collect()
        xs.append(time.monotonic() - t0)
    return round(sorted(xs)[1], 3)

def run_once(fn):
    t0 = time.monotonic()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    dt = time.monotonic() - t0
    spark.catalog.clearCache()
    return dt

print(json.dumps({"cal_start": cal()}), flush=True)
for name in NAMES:
    new_fn, old_fn = QUERIES[name].fn, OLD[name]
    s = {"old": [], "new": []}
    for _ in range(RUNS):
        s["old"].append(run_once(old_fn))
        s["new"].append(run_once(new_fn))
    print(
        json.dumps(
            {
                name: {
                    "old": round(median(s["old"]), 3),
                    "new": round(median(s["new"]), 3),
                    "speedup": round(median(s["old"]) / median(s["new"]), 2),
                }
            }
        ),
        flush=True,
    )
print(json.dumps({"cal_end": cal()}))
