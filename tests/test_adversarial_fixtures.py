"""Oracle parity on ADVERSARIAL fixtures: boundary inputs the generated
testdata never produces (timestamp collisions, equal-ts ties, null
values, decay-cap ages, same-date duplicate orders).

The asof same-instant bug survived two full parity gates because the
real tables never collide an event timestamp with an order date; this
file closes that class of blind spot by running the SAME driver-style
compare (Spark vs DuckDB) over a tiny crafted star corner.
"""

from __future__ import annotations

import duckdb
import pytest

# slow tier: excluded from the default run (pytest.ini); run with -m ""
pytestmark = pytest.mark.slow

from convex_batch_processor_spark.queries import QUERIES

from .oracle_check import compare

# boundary-sensitive queries that read only events/orders
_QUERIES = [
    "asof_join_latest_order",
    "asof_join_next_order",
    "cdc_apply_changelog",
    "event_sequence_violations",
    "time_decay_user_score",
    "repeat_purchase_interval",
    "view_purchase_attribution",
    "mad_outliers",
    "gapfill_daily_counts",
    "weighted_sample_orders",
    "benford_order_prices",
    "revenue_pareto_bands",
    "bootstrap_order_price_means",
    "zorder_layout_stats",
    "user_rfm_segments",
    "psi_value_drift",
    "chi2_independence_cells",
    "km_signup_to_purchase",
    "ts_feature_matrix",
    "burst_detection_daily",
    "scd2_user_state",
    "snapshot_state_diff",
    "event_debounce",
    "longest_active_streak",
    "ctr_wilson_bounds",
    "window_funnel_depth",
    # continuation-session additions (events/orders only)
    "journey_triples_topk",
    "welch_ttest_priorities",
    "consistent_hash_rebalance",
    "histogram_quantile_accuracy",
    "functional_dependency_check",
    "hll_accuracy_profile",
    # round-4 continuation additions (events/orders only)
    "peak_concurrency_by_user",
    "partition_skew_audit",
    "dp_noisy_counts_by_type",
    "randomized_response_rate",
    "cuped_variance_reduction",  # NULL-value rows and single-period users
    "purged_time_folds",
    "did_estimator",  # NULL values and missing cells-by-day coverage
    "exposure_pattern_census",  # users with DIVERSE partial exposure sets
    "shapley_channel_attribution",
    "asof_interpolate_price",  # same-instant order + duplicate-date brackets
    "conformal_interval_coverage",
    "markov_removal_attribution",  # sparse chains: some variants lose 'start'
    "ks_wasserstein_drift",  # NULL values; tiny one-sided day splits
    "daily_autocorrelation",  # series shorter than the max lag
    "cusum_changepoint",
    "bradley_terry_strengths",  # sparse duel matrix, few judges
    "seasonal_naive_mase",  # day range too short for the lag-7 join
    "salting_advisor",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    """A minimal sf-dir with crafted collisions."""
    d = tmp_path_factory.mktemp("adv_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                -- user 7: event exactly AT an order's midnight timestamp,
                -- plus an equal-ts pair (ids 2,3) with DIFFERENT types
                (1, TIMESTAMP '2024-01-05 00:00:00', 7, 'view',     10.00, '{{"k": 1}}'),
                (2, TIMESTAMP '2024-01-05 06:00:00', 7, 'click',    20.25, '{{"k": 2}}'),
                (3, TIMESTAMP '2024-01-05 06:00:00', 7, 'purchase', 30.50, '{{"k": 3}}'),
                (4, TIMESTAMP '2024-01-06 00:00:00', 7, 'purchase', NULL,  '{{"k": 4}}'),
                -- user 8: purchase exactly at the attribution window edge
                -- (view + 30min) and a long-gap tail past the decay cap
                (5, TIMESTAMP '2024-01-05 10:00:00', 8, 'view',     1.00,  '{{"k": 5}}'),
                (6, TIMESTAMP '2024-01-05 10:30:00', 8, 'purchase', 2.00,  '{{"k": 6}}'),
                (7, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 3.00,  '{{"k": 7}}'),
                (8, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 4.00,  '{{"k": 8}}'),
                -- user 9: signup-only (censored in KM terms), null value
                (9, TIMESTAMP '2024-01-07 12:00:00', 9, 'signup',   NULL,  '{{"k": 9}}'),
                (10, TIMESTAMP '2024-01-08 12:00:00', 9, 'error',   5.75,  '{{"k": 10}}'),
                -- close-at-open boundary: event 11 starts exactly when
                -- event 10's 300 s concurrency slot closes (sweep tie rule)
                (11, TIMESTAMP '2024-01-08 12:05:00', 9, 'view',    1.25,  '{{"k": 11}}')
            ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (100, 7, 'O', 50.00, TIMESTAMP '2024-01-05 00:00:00', '1-URGENT'),
                (200, 7, 'O', 60.00, TIMESTAMP '2024-01-06 00:00:00', '2-HIGH'),
                -- duplicate-date orders for the same customer (tiebreak path)
                (300, 8, 'F', 70.00, TIMESTAMP '2024-01-05 00:00:00', '3-MEDIUM'),
                (301, 8, 'F', 80.00, TIMESTAMP '2024-01-05 00:00:00', '3-MEDIUM'),
                -- zero-price order: A-ES weight undefined, Benford excludes
                (400, 9, 'O', 0.00, TIMESTAMP '2024-01-07 00:00:00', '4-LOW')
            ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                o_orderpriority)
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


@pytest.mark.parametrize("name", _QUERIES)
def test_boundary_parity(spark, adv_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


_DOC_QUERIES = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "winnowing_fingerprint_pairs",
    "text_quality_stats",
    "rag_chunk_overlap",
    "language_id",
    "dataset_split_folds",
    "token_pmi_pairs",
    "bm25_topk",
    "tfidf_topk_terms",
    "dup_span_coverage",
    "ngram_novelty_score",
    "doc_fingerprints",
    "minhash_portable_neardup",
    "simhash_portable_neardup",
    "vocab_top_terms",
    "lm_bigram_quality",
    "dsir_importance_weights",
    "dedup_prefix_groups",
    "zipf_vocab_fit",
    "repetition_top_bigram",
    "length_curriculum_buckets",
    "gopher_quality_filter",
    "corpus_report",
    "incremental_dedup_delta",
    "token_pack_chunks",
    "cdc_chunks",
    "eval_contamination",
    "neardup_components",
    "dedup_keep_best",
    "golden_record_merge",
    "dup_cluster_size_census",
    "edit_distance_neardup",
    # continuation-session additions (documents only)
    "pii_scrub_stats",
    "url_domain_extract",
    "tfidf_cosine_pairs",
    "sorted_neighborhood_pairs",
    "exact_substr_scrub",
    "feature_hash_stats",
    "robots_filter_stats",
    "html_extract_text",
    "url_canonicalize_stats",
    "web_curation_pipeline",  # exact-dup texts (docs 2/3) hit the dedup stage
    # round-4 continuation additions (documents only)
    "skipgram_pairs_topk",  # empty doc and 1-token doc exercise the guards
    "negative_sampling_table",
    "frequent_word_subsample",
    "char_entropy_quality",
    "unicode_normalize_stats",
    "mojibake_repair_stats",
    "padding_waste_buckets",  # empty doc: 0 real tokens, full-bucket padding
    "zlib_ratio_classes",
    "gif_decode_features",
    "k_anonymity_audit",
    "neardup_eval_metrics",  # identical docs 2/3 -> one true pair
    "jaccard_pair_histogram",
    "soundex_blocking_stats",
    "readability_scores",  # empty docs yield no word rows on both sides
    "ttr_lexical_diversity",
    "containment_dup_pairs",  # identical docs 2/3: mutual full containment
    "waterfill_allocation",
    "greedy_set_cover",  # empty and single-token docs in the universe build
    "retrieval_eval_ndcg",  # query terms absent from the corpus entirely
    # round-6 additions: NULL-text coverage (doc 7) — the class the
    # payload_byte_stats NULL divergence hid in
    "payload_byte_stats",  # NULL payload -> NULL features, kept row
    "multimodal_payload_stats",
    "token_pack_greedy",  # NULL text packs as 0 tokens
    "lang_confusion_matrix",
    "mojibake_repair_stats",
    "homoglyph_spoof_stats",  # also covers token-less docs in the census
    "minhash_estimate_neardup",
    # semantic_dedup_keep / cosine_lsh_portable_neardup are pinned to
    # the production 64-dim embedding space (literal plane vectors on
    # both engines) and so run on the DEDICATED 64-dim fixture below
    # (adv_emb64_dir), not this 4-dim one.
]

_EMB_QUERIES = [
    "embedding_neardup_pairs",
    "knn_bruteforce",
    "vector_stats",
    "label_balance_undersample",
    "embedding_quantize_int8",
    # zero-vector query id 0 -> empty MMR pool (pool < k path)
    "mmr_diverse_topk",
    "lof_embedding_outliers",  # duplicate vectors -> zero-distance brackets
    "dbscan_embedding_clusters",  # 5 points: tiny cores, borders, noise
]


@pytest.fixture(scope="module")
def adv_text_dir(tmp_path_factory):
    """documents with degenerate texts + embeddings with a ZERO vector
    (0/0 cosine -> NaN paths) and duplicate vectors."""
    d = tmp_path_factory.mktemp("adv_text_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (0, '', 'en', 'web', 0),                      -- empty text
                (1, 'one', 'en', 'web', 3),                   -- 1 token
                (2, 'a b c d e f g', 'en', 'web', 13),        -- k+w-1 tokens exactly
                (3, 'a b c d e f g', 'de', 'book', 13),       -- exact duplicate text
                (4, 'x  y   z', 'en', 'web', 8),              -- runs of spaces
                (5, 'the the the the the the the the', 'en', 'web', 31),
                (6, '', 'de', 'book', 0),  -- SECOND empty doc (empty-pair path)
                (7, NULL, 'en', 'web', NULL),  -- NULL text (failed fetch/tombstone)
                -- vertical tab (\\x0B): Java \\s includes it, RE2 \\s does
                -- not — the token regex uses an explicit class (r8 review)
                (8, 'ab' || chr(11) || 'cd e', 'en', 'web', 10)
            ) t(doc_id, text, lang, source, n_chars)
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT * FROM (VALUES
                (0, CAST([0.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),  -- zero vector
                (1, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
                (2, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 2),  -- duplicate vector
                (3, CAST([0.5, 0.5, 0.0, 0.0] AS FLOAT[]), 2),
                (4, CAST([-1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 3),
                (5, CAST(NULL AS FLOAT[]), 3)  -- NULL embedding (failed encoder)
            ) t(vec_id, embedding, label)
        ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    return str(d)


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_boundary_parity_documents(spark, adv_text_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_text_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_boundary_parity_embeddings(spark, adv_text_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_text_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# 64-dim-pinned queries (VERDICT r6 #6): the hyperplane-LSH pair bakes
# 64-dim plane literals into both engines, and the IVF oracles unnest
# range(1,65) — structurally incompatible with the 4-dim fixture above,
# so they get their own 64-dim corpus with the same NULL/degenerate
# coverage that caught 9 divergences elsewhere.
_EMB64_QUERIES = [
    "semantic_dedup_keep",           # NULL vec -> singleton component
    "cosine_lsh_portable_neardup",   # NULL vec forms no signature
    "ivf_search_topk",               # NULL/zero vectors in probe + rerank
    "ivf_centroid_assign",           # NULL vec ignored by centroid means
    # round-7 sweep additions: the kmeans-family oracles all errored on
    # NULL vectors (list_transform of a NULL vector is a list OF NULLs,
    # which DuckDB's list_dot_product rejects) — fixed by training on
    # non-NULL rows (mirroring kmeans_fit's isNotNull filter) and
    # NULL-guarding the assignment distance
    "kmeans_clusters",               # NULL vec -> tiebreak cluster, NULL dist2
    "kmeans_silhouette",             # duplicate seeds -> 0/0 sil NULL rows
    "semantic_dedup_kmeans",         # NULL vec -> singleton component
    "product_quantize_pq",           # NULL vec -> code 0 x8, NULL recon_err
    "pca_top_component",             # NULL vec excluded from the iteration
]


@pytest.fixture(scope="module")
def adv_emb64_dir(tmp_path_factory):
    """64-dim embeddings with a NULL vector (failed encoder), a ZERO
    vector (0-norm cosine), an exact duplicate pair, an anti-parallel
    vector, and a bridge vector linking two near-dup pairs into one
    transitive component."""
    d = tmp_path_factory.mktemp("adv_emb64_sf")

    def vec(**at: float) -> str:
        v = [0.0] * 64
        for k, x in at.items():
            v[int(k[1:])] = x
        return "CAST([" + ", ".join(repr(x) for x in v) + "] AS FLOAT[])"

    rows = [
        f"(0, {vec(d0=1.0)}, 1)",                  # e0 — IVF query vec
        f"(1, {vec(d0=1.0)}, 1)",                  # exact duplicate of 0
        f"(2, {vec(d0=0.9, d1=0.436)}, 1)",        # cos ~0.9 with e0
        f"(3, {vec(d1=1.0)}, 2)",                  # orthogonal to e0
        f"(4, {vec(d0=0.7071, d1=0.7071)}, 2)",    # bridge: ~0.707 to both
        "(5, CAST(NULL AS FLOAT[]), 3)",           # NULL embedding
        f"(6, {vec()}, 3)",                        # zero vector (0 norm)
        f"(7, {vec(d0=-1.0)}, 3)",                 # anti-parallel to e0
    ]
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM (VALUES {', '.join(rows)}) "
        f"t(vec_id, embedding, label)) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )
    return str(d)


@pytest.mark.parametrize("name", _EMB64_QUERIES)
def test_boundary_parity_embeddings_64dim(spark, adv_emb64_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_emb64_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# Round-7 extension: a full crafted STAR corpus so the relational/TPC-H
# core gets the same adversarial treatment the events/documents packs
# have. Boundary cases: customers with no orders (anti-join), an order
# with no lineitems, zero quantities/prices, a 100% discount, negative
# and zero account balances, duplicate (price, date) top-k ties, a
# never-ordered part, a supplier that ships nothing, same-day duplicate
# orders, year-boundary dates, NULL and MALFORMED JSON props, NULL
# event values, empty/NULL/duplicate document texts. First probe found
# two real oracle divergences (DuckDB array_to_string([]) -> NULL vs
# Spark '' ; DuckDB json_extract ERRORS on malformed JSON vs Spark
# NULL), both fixed in the oracles. The name list is the machine-derived
# round-8 window (NOTES) — the queries about to be re-verified.
_STAR_QUERIES = [
    "a3_next_sequence", "agg_having", "array_functions_pack",
    "collect_list_agg", "distinct_agg", "exact_percentiles",
    "f4_backoff_schedule", "grouping_sets_pricing", "j1_per_key_agg_join",
    "j2_anti_not_exists", "j2_semi_exists", "json_extract_props",
    "o2_topk_orders", "p1_projection_view", "p4_status_guard_branch",
    "p5_batch_id_roundtrip", "q10_returned_items",
    "q18_large_volume_customer", "q1_pricing_summary",
    "q3_shipping_priority", "q5_local_supplier_volume",
    "q7_volume_shipping", "s1_point_lookup", "s2_snapshot_range_scan",
    "s3_key_collect", "scalar_datetime_math", "set_except",
    "set_except_all", "set_intersect", "set_intersect_all",
    "topk_per_group", "u1_union_views", "u2_explode_tokens",
    "w1_retention_doomed", "w2_latest_per_key", "correlated_avg_filter",
    "date_arithmetic", "dedup_keep_best", "neardup_components",
    "q11_important_part_value", "q12_shipping_delay_priority",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_supplier_part_count", "q17_small_quantity_revenue",
    "q19_disjunctive_revenue", "q20_excess_shippers",
    "q21_waiting_supplier", "q22_dormant_customer_balance",
]


@pytest.fixture(scope="module")
def adv_star_dir(tmp_path_factory):
    """Crafted TPC-H-shaped star with the production schema (doubles,
    not the DECIMALs DuckDB infers from bare literals — a DECIMAL
    l_extendedprice silently changes quantile_cont's result type)."""
    d = tmp_path_factory.mktemp("adv_star_sf")
    con = duckdb.connect()

    def copy(table: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{d}/{table}.parquet' (FORMAT PARQUET)")

    copy("region", "SELECT * FROM (VALUES (0,'AMERICA'),(1,'ASIA')) "
                   "t(r_regionkey, r_name)")
    copy("nation", "SELECT * FROM (VALUES (0,'BRAZIL',0),(1,'CANADA',0),"
                   "(2,'JAPAN',1),(3,'INDIA',1)) "
                   "t(n_nationkey, n_name, n_regionkey)")
    copy("customer", """
        SELECT c_custkey, c_name, c_nationkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
        FROM (VALUES
            (CAST(1 AS BIGINT),'Customer#000000001',0, 100.50,'BUILDING'),
            (2,'Customer#000000002',1, -50.25,'AUTOMOBILE'),
            (3,'Customer#000000003',2, 0.00,'BUILDING'),
            (4,'Customer#000000004',3, 999.99,'MACHINERY'),
            (5,'Customer#000000005',0, 100.50,'BUILDING'),
            (6,'Customer#000000006',2, 10.10,'HOUSEHOLD'),
            -- r8 review pin: NULL segment — concat_ws/concat NULL
            -- handling must match across engines (string_functions)
            (7,'Customer#000000007',1, 50.00, NULL)
        ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""")
    copy("supplier", """
        SELECT s_suppkey, s_name, s_nationkey,
               CAST(s_acctbal AS DOUBLE) AS s_acctbal
        FROM (VALUES
            (CAST(1 AS BIGINT),'Supplier#000000001',0,500.00),
            (2,'Supplier#000000002',1,-10.00),
            (3,'Supplier#000000003',2,0.00),
            (4,'Supplier#000000004',3,500.00)
        ) t(s_suppkey, s_name, s_nationkey, s_acctbal)""")
    copy("part", """
        SELECT p_partkey, p_name, p_brand, p_type, p_size,
               CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM (VALUES
            (CAST(1 AS BIGINT),'green metal box','Brand#12','SMALL PLATED COPPER',5,100.00),
            (2,'red shiny case','Brand#23','MEDIUM BRUSHED STEEL',15,0.00),
            (3,'promo steel thing','Brand#12','PROMO ANODIZED TIN',25,55.55),
            (4,'blue thing','Brand#34','LARGE POLISHED NICKEL',50,1000.00),
            (5,'green metal box','Brand#12','SMALL PLATED COPPER',5,100.00)
        ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)""")
    copy("orders", """
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM (VALUES
            (CAST(1 AS BIGINT),CAST(1 AS BIGINT),'O',100.00,TIMESTAMP '2024-01-01 00:00:00','1-URGENT'),
            (2,1,'F',200.00,TIMESTAMP '2024-01-01 00:00:00','5-LOW'),
            (3,2,'O',0.00,TIMESTAMP '2024-02-15 00:00:00','3-MEDIUM'),
            (4,2,'P',300.75,TIMESTAMP '2024-03-01 00:00:00','2-HIGH'),
            (5,6,'F',150.00,TIMESTAMP '2024-03-01 00:00:00','1-URGENT'),
            (6,6,'O',150.00,TIMESTAMP '2024-03-01 00:00:00','1-URGENT'),
            (7,1,'F',50.00,TIMESTAMP '2023-12-31 00:00:00','4-NOT SPECIFIED'),
            (8,5,'O',9999.99,TIMESTAMP '2024-06-30 00:00:00','1-URGENT'),
            -- r8 review pins: order 9 (ASIA customer 4) anchors the
            -- zero-revenue 1996-09 group for q14/q8 try_divide; order 10
            -- has an INTRA-DAY orderdate inside q4's window so the
            -- lateness threshold carries time-of-day
            (9,4,'F',0.00,TIMESTAMP '1996-09-15 00:00:00','3-MEDIUM'),
            (10,3,'O',100.00,TIMESTAMP '1996-03-01 12:00:00','2-HIGH')
        ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
            o_orderdate, o_orderpriority)""")
    copy("lineitem", """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               CAST(l_quantity AS DOUBLE) AS l_quantity,
               CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
               CAST(l_discount AS DOUBLE) AS l_discount,
               CAST(l_tax AS DOUBLE) AS l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM (VALUES
            (CAST(1 AS BIGINT),CAST(1 AS BIGINT),CAST(1 AS BIGINT),1,17.0,100.00,0.00,0.00,'N','O',TIMESTAMP '2024-01-05 00:00:00'),
            (1,3,2,2, 0.0, 55.55,0.05,0.08,'N','O',TIMESTAMP '2024-01-06 00:00:00'),
            (2,2,2,1, 36.0, 0.00,1.00,0.00,'R','F',TIMESTAMP '2024-01-10 00:00:00'),
            (2,1,1,2, 5.0, 20.00,0.10,0.02,'A','F',TIMESTAMP '2024-01-10 00:00:00'),
            (3,3,3,1, 50.0, 500.00,0.02,0.04,'N','O',TIMESTAMP '2024-02-20 00:00:00'),
            (4,1,1,1, 2.0, 10.00,0.07,0.00,'N','O',TIMESTAMP '2024-03-05 00:00:00'),
            (5,3,3,1, 30.0, 333.33,0.05,0.05,'R','F',TIMESTAMP '2024-03-02 00:00:00'),
            (6,2,2,1, 30.0, 333.33,0.05,0.05,'R','F',TIMESTAMP '2024-03-02 00:00:00'),
            (7,1,1,1, 1.0, 1.99,0.00,0.00,'A','F',TIMESTAMP '2023-12-31 00:00:00'),
            -- r8 review pins: line 9 is the ONLY 1996-09 shipment and is
            -- 100%-discounted -> q14's month revenue is exactly 0 (the
            -- ANSI DIVIDE_BY_ZERO crash path pre-fix) and q8's 1996 ASIA
            -- year group is all-zero revenue; line 10 ships 06:00 on the
            -- 60th day after order 10's 12:00 orderdate — late under the
            -- old date-truncating threshold, NOT late under the oracle's
            -- full-timestamp + INTERVAL 60 DAY
            (9,3,1,1, 10.0, 100.00,1.00,0.00,'N','O',TIMESTAMP '1996-09-20 00:00:00'),
            (10,1,1,1, 4.0, 50.00,0.00,0.00,'N','O',TIMESTAMP '1996-04-30 06:00:00')
        ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag,
            l_linestatus, l_shipdate)""")
    copy("events", """
        SELECT event_id, ts, user_id, event_type,
               CAST(value AS DOUBLE) AS value, props
        FROM (VALUES
            (CAST(1 AS BIGINT), TIMESTAMP '2024-01-05 00:00:00', CAST(7 AS BIGINT), 'view',     10.00, '{"k": 1}'),
            (2, TIMESTAMP '2024-01-05 06:00:00', 7, 'click',    20.25, '{"k": 2}'),
            (3, TIMESTAMP '2024-01-05 06:00:00', 7, 'purchase', 30.50, '{"k": 3}'),
            (4, TIMESTAMP '2024-01-06 00:00:00', 7, 'purchase', NULL,  '{"k": 4}'),
            (5, TIMESTAMP '2024-01-05 10:00:00', 8, 'view',     1.00,  '{"k": 5}'),
            (6, TIMESTAMP '2024-01-05 10:30:00', 8, 'purchase', 2.00,  '{"k": 6}'),
            (7, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 3.00,  '{"k": 7}'),
            (8, TIMESTAMP '2024-02-20 00:00:00', 8, 'purchase', 4.00,  '{"k": 8}'),
            (9, TIMESTAMP '2024-01-07 12:00:00', 9, 'signup',   NULL,  NULL),
            (10, TIMESTAMP '2024-01-08 12:00:00', 9, 'error',   5.75,  'not json'),
            (11, TIMESTAMP '2024-01-08 12:05:00', 9, 'view',    1.25,  '{"k": 11, "nested": {"x": 2}}'),
            -- ADVICE r7: zero-variance groups CONTAINING NULLs — the
            -- class group_zscore's old oracle diverged on (ELSE 0.0 vs
            -- the pandas NULL-preserving vals * 0.0)
            (12, TIMESTAMP '2024-01-09 00:00:00', 10, 'view',   0.00,  NULL),
            (13, TIMESTAMP '2024-01-09 01:00:00', 10, 'click',  NULL,  NULL),
            -- all-NULL user: oracle var is NULL, pandas var is 0 — both
            -- must emit NULL z-scores
            (14, TIMESTAMP '2024-01-09 02:00:00', 11, 'view',   NULL,  NULL),
            (15, TIMESTAMP '2024-01-09 03:00:00', 11, 'click',  NULL,  NULL),
            -- constant NEGATIVE group: zero variance, z = value * 0.0
            -- is -0.0 on BOTH engines (sign-of-zero parity)
            (16, TIMESTAMP '2024-01-09 04:00:00', 12, 'view',   -3.50, NULL),
            (17, TIMESTAMP '2024-01-09 05:00:00', 12, 'click',  -3.50, NULL),
            -- r8 review pins: quoted-number and fractional k — Spark's
            -- typed from_json('k BIGINT') yields NULL for both; the old
            -- bare-TRY_CAST oracle accepted '7' and rounded 1.9 to 2
            (18, TIMESTAMP '2024-01-10 00:00:00', 13, 'view',   1.00,  '{"k": "7"}'),
            (19, TIMESTAMP '2024-01-10 01:00:00', 13, 'click',  2.00,  '{"k": 1.9}'),
            -- NULL event_type: batch-id composition must propagate NULL
            -- (concat/|| convention), never compose the bare seq
            (20, TIMESTAMP '2024-01-10 02:00:00', 13, NULL,     3.00,  '{"k": 5}')
        ) t(event_id, ts, user_id, event_type, value, props)""")
    copy("documents", """
        SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), '', 'en', 'web', CAST(0 AS BIGINT)),
            (1, 'one', 'en', 'web', 3),
            (2, 'a b c d e f g', 'en', 'web', 13),
            (3, 'a b c d e f g', 'de', 'book', 13),
            (4, 'x  y   z', 'en', 'web', 8),
            (5, 'the the the the the the the the', 'en', 'web', 31),
            (6, '', 'de', 'book', 0),
            (7, NULL, 'en', 'web', NULL),
            -- r8 review pin: NULL language — per-lang windows must pin
            -- NULLS FIRST/LAST identically on both engines
            (8, 'null lang doc', NULL, 'web', 13)
        ) t(doc_id, text, lang, source, n_chars)""")
    copy("embeddings", """
        SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), CAST([0.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
            (1, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
            (2, CAST(NULL AS FLOAT[]), 2)
        ) t(vec_id, embedding, label)""")
    return str(d)


@pytest.mark.parametrize("name", _STAR_QUERIES)
def test_boundary_parity_star(spark, adv_star_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_star_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# Broad sweep: every other oracle-backed query that reads only star
# tables (embeddings excluded — several oracles pin the production
# 64-dim space). The first probe of this list found FOUR more real
# defects: group_zscore CRASHED on NULL values (IntCastingNaNError in
# the pandas UDF), winsorize summed NULL comparisons to NULL where the
# oracle says 0, attach_warc_payload silently packed NULL text as an
# EMPTY archive (now NULL payload -> NULL features), and
# logloss_quantity_model lost 1e-8 to Spark's decimal precision-loss
# mode (long x decimal(18,9) needs precision 39 -> products rounded to
# scale 8; narrowed to decimal(12,9)).
_STAR_QUERIES_BROAD = [
    "quantile_normalize_values", "jaro_winkler_linkage",
    "fellegi_sunter_weights", "langid_confusion_matrix",
    "voptimal_cost_curve", "equiwidth_vs_voptimal", "join_order_advisor",
    "cidr_zone_lookup", "window_rank_lag_running", "window_moving_avg",
    "cube_pricing", "rollup_year_priority", "pivot_status_qty",
    "s11_delete_anti_join", "s10_state_upsert", "tumbling_window_counts",
    "sliding_window_counts", "f6_null_coalesce_guards",
    "window_distribution", "window_range_frame", "funnel_conversion",
    "retention_cohorts", "value_histogram",
    "rolling_weekly_active_users", "event_type_transitions",
    "new_vs_returning_users", "winsorize_event_values",
    "audio_decode_features", "ccnet_perplexity_buckets",
    "token_budget_allocation", "cms_heavy_hitters",
    "hll_distinct_by_lang", "bloom_decontamination_prefilter",
    "image_decode_features", "video_frame_stats", "mixture_weights_sqrt",
    "source_cap_sample", "session_window_agg", "sampled_by_lang",
    "lang_source_profile", "grouped_map_zscore",
    "stratified_sample_systematic", "training_data_pipeline",
    "training_mix_report", "training_pipeline_v2", "lm_trigram_quality",
    "sql_api_revenue_by_nation", "unpivot_doc_metrics",
    "string_functions", "scalar_subquery_filter", "q6_forecast_revenue",
    "q2_min_cost_supplier", "q8_market_share",
    "q4_priority_with_late_lines", "q9_product_type_profit",
    "sessionize_events", "hll_union_sources", "dq_constraint_report",
    "pagerank_event_graph", "supplier_triangles", "neyman_allocation",
    "market_basket_rules", "label_propagation_communities",
    "vocab_entropy_by_source", "keyset_page_orders",
    "price_quantity_correlation", "histogram_median_price",
    "ols_trend_daily_revenue", "rrf_fusion_topk", "gini_by_segment",
    "join_size_estimate_cms", "best_split_information_gain",
    "pareto_front_parts", "linear_attribution_credit",
    "png_decode_features", "warc_extract_stats",
    "auc_quantity_returnflag", "logloss_quantity_model",
    "ols_price_normal_eq", "calibration_bins", "calibration_ece_brier",
    "bfs_hop_distance", "target_encode_brand",
    # dim-agnostic embedding consumers (the 64-dim-pinned kmeans family
    # lives in _EMB64_QUERIES instead)
    "dbscan_label_ari", "clustering_purity", "clustering_nmi_vmeasure",
    "doc_embedding_join", "hard_negative_mining", "catalog_stats_profile",
]


@pytest.mark.parametrize("name", _STAR_QUERIES_BROAD)
def test_boundary_parity_star_broad(spark, adv_star_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_star_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# Degenerate-math fixture (round-7 review findings): a corpus crafted to
# hit every zero-denominator and NULL-ordering path the production data
# never produces — a single user (CUPED var_x = 0), heartbeat-constant
# daily series (MASE mae1 = 0), all-tie duels (Bradley-Terry den = 0),
# zero purchase events (Markov p_full = 0), exactly bucket-budget
# distinct quantities (V-optimal sse_opt = 0), a NULL-price bracketing
# order (as-of interpolation), a NULL quantity (histogram NULL-ordering),
# an all-NULL-text source (waterfill NULL demand), and a NULL-ts event
# (journey-window NULL placement). Before the round-7 guards, five of
# these CRASHED Spark outright (ANSI DIVIDE_BY_ZERO) and the rest
# silently diverged from the oracle.
_DEGENERATE_QUERIES = [
    "asof_interpolate_price",
    "equiwidth_vs_voptimal",
    "voptimal_cost_curve",
    "quantile_normalize_values",
    "cuped_variance_reduction",
    "seasonal_naive_mase",
    "bradley_terry_strengths",
    "markov_removal_attribution",
    "waterfill_allocation",
    # second review wave (llm61-71): one-cluster/one-label clustering
    # (ARI denominator 0, entropies 0), a single singly-relevant doc
    # (n_rel = 0 with a non-empty BM25 run), the NULL-ts event now
    # filtered identically by both engines, and empty-series parity
    "dbscan_label_ari",
    "clustering_purity",
    "clustering_nmi_vmeasure",
    "retrieval_eval_ndcg",
    "ks_wasserstein_drift",
    "cusum_changepoint",
    "daily_autocorrelation",
    "salting_advisor",
    # third review wave (llm29-38): zero-variance t-test arms, an
    # all-zero-price segment (Gini t = 0), NULL-quantity splits,
    # NULL-ts journey threading, a NULL-price skyline part
    "welch_ttest_priorities",
    "gini_by_segment",
    "best_split_information_gain",
    "journey_triples_topk",
    "pareto_front_parts",
]


@pytest.fixture(scope="module")
def adv_degenerate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_degenerate_sf")
    con = duckdb.connect()
    ev_rows = []
    eid = 1
    for day in range(1, 11):
        for etype in ("view", "click"):
            ev_rows.append(
                f"({eid}, TIMESTAMP '2024-01-{day:02d} 12:00:00', 1, "
                f"'{etype}', 1.00, NULL)"
            )
            eid += 1
    ev_rows.append(f"({eid}, NULL, 1, 'view', 2.50, NULL)")
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CAST(value AS DOUBLE) AS value, props
              FROM (VALUES {", ".join(ev_rows)})
              t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)""")
    # customers 2/3 have no events, so their orders cannot disturb the
    # as-of bracket scenario built on customer 1: customer 2 carries the
    # zero-variance Welch arms (two URGENT at one price, two LOW at
    # another), customer 3 the all-zero-price Gini segment
    con.execute(f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
                     CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM (VALUES
                  (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'O', 100.00,
                   TIMESTAMP '2024-01-01 00:00:00', '1-URGENT'),
                  (2, 1, 'O', NULL, TIMESTAMP '2024-01-05 00:00:00', '2-HIGH'),
                  (3, 1, 'F', 50.00, TIMESTAMP '2024-01-09 00:00:00', '3-MEDIUM'),
                  (4, 2, 'O', 100.00, TIMESTAMP '2024-02-01 00:00:00', '1-URGENT'),
                  (5, 2, 'O', 100.00, TIMESTAMP '2024-02-02 00:00:00', '1-URGENT'),
                  (6, 2, 'F', 200.00, TIMESTAMP '2024-02-03 00:00:00', '5-LOW'),
                  (7, 2, 'F', 200.00, TIMESTAMP '2024-02-04 00:00:00', '5-LOW'),
                  (8, 3, 'O', 0.00, TIMESTAMP '2024-02-05 00:00:00', '3-MEDIUM'),
                  (9, 3, 'O', 0.00, TIMESTAMP '2024-02-06 00:00:00', '3-MEDIUM'))
              t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT c_custkey, c_name, c_nationkey,
                     CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment
              FROM (VALUES
                  (CAST(1 AS BIGINT), 'Customer#000000001', 0, 10.00, 'BUILDING'),
                  (2, 'Customer#000000002', 1, 20.00, 'MACHINERY'),
                  (3, 'Customer#000000003', 1, 0.00, 'ZEROSEG'))
              t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment))
        TO '{d}/customer.parquet' (FORMAT PARQUET)""")
    # part 3: NULL retail price with the SMALLEST size — before the
    # guard, Spark's NULLS-FIRST cumulative min let it dominate every
    # real part while DuckDB's NULLS-LAST ignored it
    con.execute(f"""
        COPY (SELECT p_partkey, p_name, p_brand, p_type, p_size,
                     CAST(p_retailprice AS DOUBLE) AS p_retailprice
              FROM (VALUES
                  (CAST(1 AS BIGINT), 'green box', 'Brand#12',
                   'SMALL PLATED', 10, 50.00),
                  (2, 'red case', 'Brand#23', 'MEDIUM BRUSHED', 5, 80.00),
                  (3, 'ghost part', 'Brand#34', 'LARGE POLISHED', 1, NULL))
              t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice))
        TO '{d}/part.parquet' (FORMAT PARQUET)""")
    li_rows = [
        f"(CAST({q} AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1, "
        f"{q}.0, {q * 10}.00, 0.0, 0.0, 'N', 'O', "
        f"TIMESTAMP '2024-01-0{q} 00:00:00')"
        for q in range(1, 7)
    ]
    li_rows.append(
        "(7, 1, 1, 1, NULL, 40.00, 0.0, 0.0, 'A', 'F', "
        "TIMESTAMP '2024-01-10 00:00:00')"
    )
    con.execute(f"""
        COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     CAST(l_quantity AS DOUBLE) AS l_quantity,
                     CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
                     CAST(l_discount AS DOUBLE) AS l_discount,
                     CAST(l_tax AS DOUBLE) AS l_tax,
                     l_returnflag, l_linestatus, l_shipdate
              FROM (VALUES {", ".join(li_rows)})
              t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                l_extendedprice, l_discount, l_tax, l_returnflag,
                l_linestatus, l_shipdate))
        TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
                  (CAST(0 AS BIGINT), 'alpha beta gamma', 'en', 'web',
                   CAST(16 AS BIGINT)),
                  (1, 'delta epsilon', 'en', 'web', 13),
                  (2, NULL, 'en', 'nulls', NULL),
                  (3, NULL, 'de', 'nulls', NULL),
                  (4, 'join alpha beta', 'en', 'web', 15))
              t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    # five identical vectors, one label: DBSCAN yields ONE cluster over
    # ONE label — ARI's denominator and both entropies are exactly 0
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
                  (CAST(0 AS BIGINT), CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
                  (1, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
                  (2, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
                  (3, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1),
                  (4, CAST([1.0, 0.0, 0.0, 0.0] AS FLOAT[]), 1))
              t(vec_id, embedding, label))
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)""")
    return str(d)


@pytest.mark.parametrize("name", _DEGENERATE_QUERIES)
def test_boundary_parity_degenerate(spark, adv_degenerate_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_degenerate_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# ---------------------------------------------------------------------------
# NULL-ordering corner (round-8 second line-review): Spark orders ASC with
# NULLS FIRST, DuckDB with NULLS LAST, so any window/tiebreak over a nullable
# column silently diverges unless pinned on both sides. These fixtures hold
# the exact rows that made each query below FAIL the driver-style compare
# before the NULLS FIRST pins landed (probe-confirmed divergences, not
# hypotheticals): a NULL-ts event amid real ones (session membership, rank/
# lag/moving-avg frames, lag pairings), and an exact-dup pair whose members
# tie the lang-majority vote 1-1 with one NULL lang.
_NULLORDER_QUERIES = [
    "sessionize_events",
    "session_window_agg",
    "window_rank_lag_running",
    "window_moving_avg",
    "event_type_transitions",
    "golden_record_merge",
]


@pytest.fixture(scope="module")
def adv_nullorder_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_nullorder_sf")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CAST(value AS DOUBLE) AS value, props
              FROM (VALUES
                (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 12:00:00',
                 CAST(1 AS BIGINT), 'view',  1.00, NULL),
                (2, TIMESTAMP '2024-02-15 12:00:00', 1, 'click', 2.00, NULL),
                (3, TIMESTAMP '2024-02-16 12:00:00', 1, 'view',  3.00, NULL),
                (4, NULL,                            1, 'click', 2.50, NULL),
                (5, TIMESTAMP '2024-01-02 12:00:00', 2, 'view',  1.50, NULL),
                (6, NULL,                            2, NULL,    1.75, NULL),
                (7, TIMESTAMP '2024-01-03 12:00:00', 2, NULL,    2.25, NULL),
                (8, TIMESTAMP '2024-01-04 12:00:00', 2, 'view',  4.00, NULL),
                (9, TIMESTAMP '2024-01-05 12:00:00', 2, 'click', 5.00, NULL)
              ) t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)""")
    # docs 0/1: exact-dup texts, lang 'en' vs NULL -> 1-1 majority tie
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
            (CAST(0 AS BIGINT),
             'alpha beta gamma delta epsilon zeta eta theta iota kappa',
             'en', 'web', CAST(50 AS BIGINT)),
            (1, 'alpha beta gamma delta epsilon zeta eta theta iota kappa',
             NULL, 'web', 50),
            (2, 'one two three four five six seven eight nine ten',
             'en', NULL, 40),
            (3, 'uno dos tres cuatro cinco seis siete ocho nueve diez',
             'de', NULL, 44),
            (4, 'moon sun star cloud rain snow wind storm fog mist',
             'en', 'crawl', 42)
          ) t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", _NULLORDER_QUERIES)
def test_boundary_parity_nullorder(spark, adv_nullorder_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_nullorder_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# Largest-remainder NULL-stratum tie: both allocation queries rank strata by
# (rem DESC, key ASC) to grant the +1 leftover units; an unpinned key put a
# NULL stratum before the tied name in Spark and after it in DuckDB. The rows
# below are brute-forced so the NULL stratum EXACTLY ties a named stratum's
# rem with leftover=1 (neyman: value diffs 1/1/14 cents -> wi 141/141/1980,
# tw=2262, rem 756/756/750; token_budget: 3/3/13 tokens -> T=19, rem 7/7/5).
_REMTIE_QUERIES = ["neyman_allocation", "token_budget_allocation"]


@pytest.fixture(scope="module")
def adv_remtie_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_remtie_sf")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CAST(value AS DOUBLE) AS value, props
              FROM (VALUES
                (CAST(1 AS BIGINT), TIMESTAMP '2024-01-01 00:00:00',
                 CAST(1 AS BIGINT), NULL, 1.00, NULL),
                (2, TIMESTAMP '2024-01-02 00:00:00', 1, NULL, 1.01, NULL),
                (3, TIMESTAMP '2024-01-03 00:00:00', 1, 'aa', 2.00, NULL),
                (4, TIMESTAMP '2024-01-04 00:00:00', 1, 'aa', 2.01, NULL),
                (5, TIMESTAMP '2024-01-05 00:00:00', 1, 'zz', 5.00, NULL),
                (6, TIMESTAMP '2024-01-06 00:00:00', 1, 'zz', 5.14, NULL)
              ) t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), 'one two three', NULL, NULL, CAST(13 AS BIGINT)),
            (1, 'uno dos tres', 'en', 'bb', 12),
            (2, 'a b c d e f g h i j k l m', 'en', 'cc', 25)
          ) t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", _REMTIE_QUERIES)
def test_boundary_parity_remtie(spark, adv_remtie_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_remtie_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# NULL-key / NULL-date corner (round-8 batch-B line review): SQL join
# predicates never match NULL, but Spark's union-and-window as-of groups
# NULL keys into one partition and sorts NULL timestamps first — a NULL-key
# event captured NULL-custkey orders, a NULL-orderdate order landed inside
# every event's preceding frame, and unpinned lag/cumsum windows over
# nullable ts/day re-ordered per engine (probe-confirmed divergences, all).
# Also pins: bootstrap's NULL-propagating replicate hash (concat vs
# concat_ws) via the NULL-o_orderkey order row.
_NULLKEYS_QUERIES = [
    "asof_join_next_order",
    "asof_join_latest_order",
    "scd2_user_state",
    "repeat_purchase_interval",
    "event_sequence_violations",
    "pagerank_event_graph",
    "km_signup_to_purchase",
    "bootstrap_order_price_means",
    # second batch (same corner, plus the NULL-price order and the
    # zero-variance lineitem groups below): unpinned windows over
    # nullable ts/cents, DuckDB tuple-comparison NULL totality, ANSI
    # zero-variance crash
    "event_debounce",
    "longest_active_streak",
    "keyset_page_orders",
    "histogram_median_price",
    "price_quantity_correlation",
]


@pytest.fixture(scope="module")
def adv_nullkeys_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_nullkeys_sf")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT event_id, ts, user_id, event_type,
                     CAST(value AS DOUBLE) AS value, props
              FROM (VALUES
                (CAST(1 AS BIGINT), TIMESTAMP '2024-01-02 00:00:00', NULL,
                 'view', 1.00, NULL),
                (2, TIMESTAMP '2024-01-01 00:00:00', CAST(7 AS BIGINT), 'view', 2.00, NULL),
                (3, TIMESTAMP '2024-01-03 00:00:00', 7, 'purchase', 3.00, NULL),
                (4, NULL,                            7, 'click', 4.00, NULL),
                (5, TIMESTAMP '2024-01-05 00:00:00', 7, 'view', 5.00, NULL),
                (6, TIMESTAMP '2024-01-02 00:00:00', 8, 'signup', 1.50, NULL),
                (7, TIMESTAMP '2024-01-04 00:00:00', 8, 'purchase', 2.50, NULL),
                (8, TIMESTAMP '2024-01-06 00:00:00', 8, 'purchase', 3.50, NULL),
                (9, NULL,                            9, 'signup', 1.25, NULL),
                (10, TIMESTAMP '2024-01-08 00:00:00', 9, 'purchase', 2.25, NULL),
                (11, TIMESTAMP '2024-01-09 00:00:00', 9, 'error', 0.50, NULL),
                (12, TIMESTAMP '2024-01-10 00:00:00', 9, 'view', 0.75, NULL),
                (13, NULL,                            8, 'purchase', 9.00, NULL)
              ) t(event_id, ts, user_id, event_type, value, props))
        TO '{d}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
                     CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM (VALUES
                (CAST(100 AS BIGINT), NULL, 'O', 50.00,
                 TIMESTAMP '2024-01-01 00:00:00', '1-URGENT'),
                (200, CAST(7 AS BIGINT), 'O', 60.00, NULL, '2-HIGH'),
                (300, NULL, 'F', 70.00, TIMESTAMP '2024-01-04 00:00:00', '3-MEDIUM'),
                (400, 8, 'F', -100.00, TIMESTAMP '2024-01-05 00:00:00', '4-LOW'),
                (500, 7, 'O', 80.00, TIMESTAMP '2024-01-04 00:00:00', '5-LOW'),
                (600, 8, 'O', 90.00, TIMESTAMP '2024-01-03 00:00:00', '1-URGENT'),
                (NULL, 8, 'O', 95.00, TIMESTAMP '2024-01-07 00:00:00', '2-HIGH'),
                (700, 7, 'O', NULL, TIMESTAMP '2024-01-08 00:00:00', '1-URGENT')
              ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    # single-row 'R' group and constant-quantity 'A' group: zero variance
    # on one or both axes (the ANSI DIVIDE_BY_ZERO guard path)
    con.execute(f"""
        COPY (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
                     CAST(l_quantity AS DOUBLE) AS l_quantity,
                     CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
                     CAST(l_discount AS DOUBLE) AS l_discount,
                     CAST(l_tax AS DOUBLE) AS l_tax,
                     l_returnflag, l_linestatus, l_shipdate
              FROM (VALUES
                (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT), 1,
                 5.0, 100.00, 0.0, 0.0, 'R', 'O', TIMESTAMP '2024-01-01 00:00:00'),
                (2, 1, 1, 1, 3.0, 50.00, 0.0, 0.0, 'A', 'F',
                 TIMESTAMP '2024-01-02 00:00:00'),
                (3, 1, 1, 2, 3.0, 70.00, 0.0, 0.0, 'A', 'F',
                 TIMESTAMP '2024-01-03 00:00:00'),
                (4, 1, 1, 1, 2.0, 20.00, 0.0, 0.0, 'N', 'O',
                 TIMESTAMP '2024-01-04 00:00:00'),
                (5, 1, 1, 2, 4.0, 40.00, 0.0, 0.0, 'N', 'O',
                 TIMESTAMP '2024-01-05 00:00:00'))
              t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                l_extendedprice, l_discount, l_tax, l_returnflag,
                l_linestatus, l_shipdate))
        TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", _NULLKEYS_QUERIES)
def test_boundary_parity_nullkeys(spark, adv_nullkeys_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_nullkeys_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"


# Single-date corpus: every order on ONE o_orderdate zeroes the OLS x-variance
# — Spark crashed with ANSI DIVIDE_BY_ZERO where the oracle yields NULL
# (batch-B line review; both sides now carry a division-free varx guard).
@pytest.fixture(scope="module")
def adv_singledate_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_singledate_sf")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT o_orderkey, o_custkey, o_orderstatus,
                     CAST(o_totalprice AS DOUBLE) AS o_totalprice,
                     o_orderdate, o_orderpriority
              FROM (VALUES
                (CAST(1 AS BIGINT), CAST(1 AS BIGINT), 'O', 100.00,
                 TIMESTAMP '2024-03-01 00:00:00', '1-URGENT'),
                (2, 2, 'F', 250.00, TIMESTAMP '2024-03-01 00:00:00', '2-HIGH'))
              t(o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderdate, o_orderpriority))
        TO '{d}/orders.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(d)


def test_boundary_parity_ols_single_date(spark, adv_singledate_dir):
    spec = QUERIES["ols_trend_daily_revenue"]
    ok, detail = compare(spark, adv_singledate_dir, "ols_trend_daily_revenue",
                         spec.fn, spec.oracle)
    assert ok, f"ols_trend_daily_revenue: {detail}"


# Degenerate-dedup / constant-embedding corner (r8 llmops review):
# tombstoned NULL-text docs must NOT pair as near-dups (they shared the
# md5('') block and the empty-empty 0.0 fallback), identical sub-3-token
# docs MUST pair (empty shingle sets NULL-dropped them), a constant
# embedding corpus has no principal direction (zero-norm guard, was
# ZeroDivisionError), and a NULL vector at the lowest id must not abort
# the PQ dimension probe.
_SHORTDUP_QUERIES = [
    "edit_distance_neardup",
    "sorted_neighborhood_pairs",
    "pca_top_component",
    "product_quantize_pq",
]


@pytest.fixture(scope="module")
def adv_shortdup_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adv_shortdup_sf")
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), NULL, 'en', 'web', NULL),
            (1, NULL, 'de', 'web', NULL),
            (2, 'foo bar', 'en', 'web', CAST(7 AS BIGINT)),
            (3, 'foo bar', 'en', 'web', 7),
            (4, 'alpha beta gamma delta epsilon zeta', 'en', 'web', 35),
            (5, 'alpha beta gamma delta epsilon zeta', 'en', 'web', 35),
            (6, 'solo unique text content here now', 'de', 'crawl', 33)
          ) t(doc_id, text, lang, source, n_chars))
        TO '{d}/documents.parquet' (FORMAT PARQUET)""")
    vec = "[" + ", ".join(["0.5"] * 64) + "]"
    con.execute(f"""
        COPY (SELECT * FROM (VALUES
            (CAST(0 AS BIGINT), NULL, 1),
            (1, CAST({vec} AS FLOAT[]), 1),
            (2, CAST({vec} AS FLOAT[]), 1),
            (3, CAST({vec} AS FLOAT[]), 2),
            (4, CAST({vec} AS FLOAT[]), 2)
          ) t(vec_id, embedding, label))
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", _SHORTDUP_QUERIES)
def test_boundary_parity_shortdup(spark, adv_shortdup_dir, name):
    spec = QUERIES[name]
    ok, detail = compare(spark, adv_shortdup_dir, name, spec.fn, spec.oracle)
    assert ok, f"{name}: {detail}"
