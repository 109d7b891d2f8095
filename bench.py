"""Headline benchmark: runs representative queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect cost). Set SPARK_GRAFT_BENCH_QUERIES=a,b,c to subset.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convex_batch_processor_spark.queries import QUERIES  # noqa: E402
from convex_batch_processor_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "j1_per_key_agg_join",
    "o2_topk_orders",
    "window_rank_lag_running",
    "sessionize_events",
    "asof_join_latest_order",
    "json_extract_props",
    "cube_pricing",
    "dedup_exact",
    "text_quality_stats",
    "minhash_neardup",
    "knn_bruteforce",
    "tumbling_window_counts",
    "s10_state_upsert",
    # round-2 additions: banded-LSH embedding near-dup (the scale path that
    # replaced the all-pairs theta join) and the two decorrelation shapes
    "cosine_neardup_bucketed",
    "q2_min_cost_supplier",
    "q21_waiting_supplier",
    # round-2 late additions: full dedup collapse (exact-Jaccard edges +
    # connected components + keep-best; the edge generation is ~85% of the
    # cost), retrieval scoring, decontamination, IVF ANN, greedy packing
    "dedup_keep_best",
    "bm25_topk",
    "eval_contamination",
    "ivf_search_topk",
    "token_pack_greedy",
    # end-to-end curation: LM quality gate → decontaminate → dedup → pack
    "training_pipeline_v2",
    # round-3 additions: map-side quality rules, TF-IDF term selection
    # (vocab-bounded broadcast), SQ8 vector quantization (map-only), and
    # iterative k-means (broadcast centroids, per-round checkpoint)
    "gopher_quality_filter",
    "tfidf_topk_terms",
    "embedding_quantize_int8",
    "kmeans_clusters",
    # native session windows + bucketed interval range join
    "session_window_agg",
    "view_purchase_attribution",
    # round-4 additions: real WAV encode+decode over mapInPandas (the
    # multimodal codec path), DSIR importance weights (term-keyed decimal
    # pipeline), inverted-index novelty scoring, latest-per-key epoch diff
    "audio_decode_features",
    "dsir_importance_weights",
    "ngram_novelty_score",
    "snapshot_state_diff",
    # late round-4 additions: sketch pack (CMS build+probe, bloom-pruned
    # decontamination) and the real BMP image codec over mapInPandas
    "cms_heavy_hitters",
    "bloom_decontamination_prefilter",
    "image_decode_features",
    "video_frame_stats",
    # post-window round-4 additions: warehouse/ML-dataset packs — MOSS
    # winnowing pairs, SCD2 history build, map-only RAG chunking, exact
    # power-of-two recency decay
    "winnowing_fingerprint_pairs",
    "scd2_user_state",
    "rag_chunk_overlap",
    "time_decay_user_score",
    # latest round-4 families: iterative graph centrality on the persisted
    # edge aggregate, Apriori 2-itemset basket rules, banded Pareto cumsum
    "pagerank_event_graph",
    "market_basket_rules",
    "revenue_pareto_bands",
    # continuation-session round-4 additions: regex PII scrub (map-only
    # codegen scan), weighted sparse-vector similarity join (inverted
    # index + decimal dots), blocked sorted-neighborhood candidate pass
    "pii_scrub_stats",
    "tfidf_cosine_pairs",
    "sorted_neighborhood_pairs",
    # final continuation-session additions: the ExactSubstr corpus rewrite
    # (inverted 8-gram index -> anti-join -> per-doc rebuild), the real
    # PNG codec round-trip, and the composed crawl flagship
    "exact_substr_scrub",
    "png_decode_features",
    "web_curation_pipeline",
    # round-4 final-session additions: map-side skip-gram pair stream,
    # char-level entropy scoring, the LZW GIF codec round-trip, the
    # inverted-index LSH quality audit, and the endpoint sweep-line
    "skipgram_pairs_topk",
    "char_entropy_quality",
    "gif_decode_features",
    "neardup_eval_metrics",
    "peak_concurrency_by_user",
    # round-5 additions: representative operators from the round-5 driver
    # window (the first-ever verified packs) — survival analysis, iterative
    # label propagation, fuzzy linkage merge, portable cosine-LSH, edit
    # distance blocking, graph triangles, CDC changelog apply, HLL merge
    "km_signup_to_purchase",
    "label_propagation_communities",
    "golden_record_merge",
    "cosine_lsh_portable_neardup",
    "edit_distance_neardup",
    "supplier_triangles",
    "cdc_apply_changelog",
    "hll_union_sources",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    names = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = names.split(",") if names else HEADLINE
    if os.environ.get("SPARK_GRAFT_BENCH_REVERSE"):
        # ordering-sensitivity probe: same work, reversed execution order —
        # if per-query timings shift materially, the suite has JIT/cache
        # ordering effects, not per-query regressions
        names = list(reversed(names))

    spark = get_spark(
        app_name="cbps-bench",
        # the sf0.1 tables are single ~2-10 MB files; split at row-group
        # granularity so the scan parallelizes across local cores (at real
        # scale files are >128 MB and the default split size is right)
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    # JVM/codegen warmup on a trivial plan so query 1 isn't charged for it
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # Python/Arrow worker warmup: spawning the 32 pandas_udf workers (each
    # importing pandas/numpy) costs ~10 s once per session; pay it here so
    # the first Python-UDF query measures steady-state, not interpreter
    # start — one task per core so every worker slot actually spawns
    from pyspark.sql.functions import col, pandas_udf  # noqa: PLC0415

    _warm = pandas_udf(lambda s: s * 1.0, "double")
    spark.range(0, 3_200, numPartitions=32).select(
        _warm(col("id").cast("double"))
    ).write.mode("overwrite").format("noop").save()

    # Host-speed calibration: a fixed-work probe (pure JVM codegen sum —
    # no IO, no Python workers, constant plan) timed AFTER warmup, median
    # of 3. Cross-run comparisons should normalize by this scalar: the
    # same code on the same host has shown 0.75-1.56x per-query scatter
    # between runs hours apart (NOTES.md), and without a calibration
    # anchor every round re-litigates host drift vs real regressions.
    cal_samples = []
    for _ in range(3):
        t0 = time.monotonic()
        spark.range(200_000_000).selectExpr(
            "sum(cast(id as double) * id) as s"  # double: id*id overflows long under ANSI
        ).collect()
        cal_samples.append(time.monotonic() - t0)
    calibration = round(sorted(cal_samples)[1], 3)

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].fn
        samples: list[float] = []
        for _ in range(runs):  # median-of-N: robust to JVM/GC jitter, unlike
            # best-of (still optimistic) or mean (one GC pause skews it)
            start = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.monotonic() - start)
            # drop intra-query persists (minhash shingles, LSH signatures)
            # after EVERY run: each call persists fresh DataFrames, and
            # letting three runs' caches coexist measures GC pressure,
            # not the query
            spark.catalog.clearCache()
        samples.sort()
        mid = len(samples) // 2
        med = samples[mid] if len(samples) % 2 else (samples[mid - 1] + samples[mid]) / 2
        timings[name] = round(med, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "calibration_sec": calibration,
            }
        )
    )


if __name__ == "__main__":
    main()
