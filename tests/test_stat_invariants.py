"""Mathematical invariants of the statistics pack — properties that hold
for ANY input, which the row-level oracle parity cannot itself assert."""

from __future__ import annotations

from pyspark.sql import functions as F

from convex_batch_processor_spark.queries import QUERIES


def q(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir)


def test_psi_terms_nonnegative(spark, sf_dir):
    """(p - q) and ln(p/q) always share a sign, so every PSI term is
    >= 0 (the metric is a proper divergence)."""
    rows = q(spark, sf_dir, "psi_value_drift").collect()
    assert rows
    assert all(r.psi_term >= 0 for r in rows)


def test_chi2_terms_nonnegative_and_expected_totals(spark, sf_dir):
    """(O-E)^2/E >= 0, and expected counts per table sum back to the
    observed total (marginal consistency)."""
    df = q(spark, sf_dir, "chi2_independence_cells")
    rows = df.collect()
    assert all(r.chi2_term >= 0 for r in rows)
    tot_o = sum(r.o for r in rows)
    tot_e = sum(r.expected for r in rows)
    assert abs(tot_e - tot_o) < 1e-6 * tot_o


def test_km_log_survival_nonincreasing(spark, sf_dir):
    """S(t) is a survival curve: log S is <= 0 and non-increasing in t."""
    rows = sorted(q(spark, sf_dir, "km_signup_to_purchase").collect(),
                  key=lambda r: r.day)
    assert rows
    prev = 0.0
    for r in rows:
        assert r.log_survival <= prev + 1e-12
        prev = r.log_survival
        assert r.n_events <= r.n_risk


def test_benford_shares_form_a_distribution(spark, sf_dir):
    """Observed digit shares and the Benford reference each sum to ~1
    over digits 1..9."""
    rows = q(spark, sf_dir, "benford_order_prices").collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-6


def test_bootstrap_effective_sizes_near_n(spark, sf_dir):
    """Poisson(1) weights: each replicate's effective size concentrates
    around n (within 5 sigma = 5*sqrt(n)), and replicate means straddle
    the true mean."""
    from convex_batch_processor_spark.catalog import load_table

    rows = q(spark, sf_dir, "bootstrap_order_price_means").collect()
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    true_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    assert len(rows) == 16
    for r in rows:
        assert abs(r.n_eff - n) <= 5 * (n ** 0.5) + 10
    means = [r.boot_mean for r in rows]
    assert min(means) <= true_mean <= max(means)


def test_pagerank_mass_conserved(spark, sf_dir):
    """With no dangling nodes, PageRank mass sums to ~1 after any number
    of iterations."""
    try:
        rows = q(spark, sf_dir, "pagerank_event_graph").collect()
    finally:
        spark.catalog.clearCache()
    assert abs(sum(r.pagerank for r in rows) - 1.0) < 1e-6


def test_neyman_allocation_sums_to_total(spark, sf_dir):
    rows = q(spark, sf_dir, "neyman_allocation").collect()
    assert sum(r.alloc for r in rows) == 1000
    assert all(r.alloc >= 0 for r in rows)


def test_lpa_labels_are_member_nodes(spark, sf_dir):
    """Every community label is itself a node of the graph (labels are
    node ids propagated by majority vote)."""
    try:
        rows = q(spark, sf_dir, "label_propagation_communities").collect()
    finally:
        spark.catalog.clearCache()
    nodes = {r.s_suppkey for r in rows}
    assert rows
    assert all(r.community in nodes for r in rows)


def test_gini_in_unit_interval(spark, sf_dir):
    """Gini of a positive-valued distribution lies in [0, 1); sample-Gini
    of near-uniform synthetic prices should also be well below 1."""
    rows = q(spark, sf_dir, "gini_by_segment").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0, r


def test_welch_dof_within_classical_bounds(spark, sf_dir):
    """Welch-Satterthwaite dof is bounded by min(n1,n2)-1 below and
    n1+n2-2 above — a wrong moment formula lands outside immediately."""
    (r,) = q(spark, sf_dir, "welch_ttest_priorities").collect()
    assert min(r["n1"], r["n2"]) - 1 <= r["welch_dof"] <= r["n1"] + r["n2"] - 2, r


def test_rrf_scores_bounded_and_ranked(spark, sf_dir):
    """Each run contributes at most 1/(60+1); fused scores are positive,
    bounded by 2/61, and the output is a consistent descending top-20."""
    rows = q(spark, sf_dir, "rrf_fusion_topk").collect()
    assert len(rows) == 20
    scores = [r["rrf_score"] for r in rows]
    assert all(0.0 < s <= 2.0 / 61.0 + 1e-12 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_cms_join_estimate_is_one_sided(spark, sf_dir):
    """The CMS inner product never underestimates the true join size."""
    (r,) = q(spark, sf_dir, "join_size_estimate_cms").collect()
    assert r["cms_est"] >= r["true_size"] > 0, r
    assert r["over_ratio"] >= 1.0


def test_information_gain_bounds(spark, sf_dir):
    """0 <= IG <= H(parent) <= ln 2 for a binary target."""
    import math

    rows = q(spark, sf_dir, "best_split_information_gain").collect()
    assert rows
    for r in rows:
        assert -1e-12 <= r["info_gain"] <= math.log(2) + 1e-12, r


def test_pareto_front_is_exactly_the_nondominated_set(spark, sf_dir):
    """Brute-force the dominance definition over the full (small) part
    table and compare with the histogram-based front."""
    from convex_batch_processor_spark.catalog import load_table

    pts = [
        (r["p_partkey"], round(r["p_retailprice"] * 100), r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    def dominated(a):
        return any(
            (b[1] <= a[1] and b[2] <= a[2]) and (b[1] < a[1] or b[2] < a[2])
            for b in pts
        )
    expect = {k for k, *_ in [p for p in pts if not dominated(p)]}
    got = {r["p_partkey"] for r in q(spark, sf_dir, "pareto_front_parts").collect()}
    assert got == expect


def test_consistent_hash_moves_about_one_seventeenth(spark, sf_dir):
    """Adding shard 17 must move roughly n/17 keys (the consistent-hashing
    guarantee); mod-hashing would move ~16n/17."""
    rows = q(spark, sf_dir, "consistent_hash_rebalance").collect()
    n = sum(r["n_keys"] for r in rows)
    moved = sum(r["n_moved_on_expand"] for r in rows)
    assert 0 < moved < 3 * n / 17, (moved, n)
    assert len(rows) == 16 and all(r["n_keys"] > 0 for r in rows)


def test_histogram_quantile_error_bounded_by_bin_width(spark, sf_dir):
    """The equi-width estimate can be off by at most one bin width; exact
    quantiles must be monotone in q."""
    rows = {r["q_pct"]: r for r in
            q(spark, sf_dir, "histogram_quantile_accuracy").collect()}
    exacts = [rows[p]["exact_cents"] for p in (50, 90, 99)]
    assert exacts == sorted(exacts)
    # recompute the bin width bound from the data
    from convex_batch_processor_spark.catalog import load_table
    from pyspark.sql import functions as F

    b = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.min(F.round(F.col("o_totalprice") * 100)).alias("lo"),
            F.max(F.round(F.col("o_totalprice") * 100)).alias("hi"),
        )
        .collect()[0]
    )
    width = (b["hi"] - b["lo"]) / 128.0
    for r in rows.values():
        assert r["abs_err"] <= width, (r, width)


def test_attribution_credit_is_conserved(spark, sf_dir):
    """Linear attribution must hand out EXACTLY each attributed purchase's
    cents — no pennies created or lost (largest-remainder contract)."""
    from convex_batch_processor_spark.catalog import load_table
    from convex_batch_processor_spark.operators.rangejoin import interval_join_bucketed
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    purch = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    pairs = interval_join_bucketed(
        views, purch, ["user_id"], "view_ts", "purchase_ts", 6 * 3600
    )
    attributed = pairs.select("purchase_id", "cents").distinct()
    expected = attributed.agg(F.sum("cents")).collect()[0][0]
    got = sum(
        r["credited_cents"]
        for r in q(spark, sf_dir, "linear_attribution_credit").collect()
    )
    assert got == expected, (got, expected)


def test_silhouette_in_valid_range(spark, sf_dir):
    """Simplified silhouette lies in [-1, 1]; the own-centroid distance
    ranking guarantees b >= a, so cluster means must be >= 0 here."""
    rows = q(spark, sf_dir, "kmeans_silhouette").collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["avg_silhouette"] <= 1.0, r
        assert r["avg_silhouette"] >= 0.0, r


def test_fd_key_dependencies_hold(spark, sf_dir):
    """o_orderkey is the table key: every orderkey-led FD must hold with
    zero violating groups and fan-out exactly 1."""
    rows = {(r["lhs"], r["rhs"]): r for r in
            q(spark, sf_dir, "functional_dependency_check").collect()}
    for rhs in ("o_custkey", "o_orderstatus"):
        r = rows[("o_orderkey", rhs)]
        assert r["n_violating_groups"] == 0 and r["max_rhs_per_lhs"] == 1, r


def test_hll_errors_within_expected_bands(spark, sf_dir):
    """Linear counting makes tiny enums near-exact; the key column stays
    within a few sigma of the 1.04/sqrt(256) ~ 6.5% standard error."""
    rows = {r["column_name"]: r for r in
            q(spark, sf_dir, "hll_accuracy_profile").collect()}
    assert rows["o_orderstatus"]["rel_error"] < 0.05
    assert rows["o_orderpriority"]["rel_error"] < 0.05
    assert rows["o_custkey"]["rel_error"] < 0.25


def test_auc_matches_sklearn_style_reference(spark, sf_dir):
    """Brute-force midrank AUC over collected (score, label) pairs equals
    the histogram form; and 0 <= AUC <= 1."""
    from collections import Counter

    from convex_batch_processor_spark.catalog import load_table

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_returnflag"
    ).collect()
    pos = Counter(); neg = Counter()
    for r in rows:
        (pos if r["l_returnflag"] == "R" else neg)[r["l_quantity"]] += 1
    num = 0.0
    cum_neg = 0
    for v in sorted(set(pos) | set(neg)):
        num += pos[v] * (cum_neg + neg[v] / 2.0)
        cum_neg += neg[v]
    P, N = sum(pos.values()), sum(neg.values())
    expect = round(num / (P * N), 9)
    (r,) = q(spark, sf_dir, "auc_quantity_returnflag").collect()
    assert r["auc"] == expect and 0.0 <= r["auc"] <= 1.0
    assert (r["n_pos"], r["n_neg"]) == (P, N)


def test_logloss_bounded_below_by_entropy(spark, sf_dir):
    """Log-loss of any calibrated-ish model is >= the label entropy's
    lower bound territory and > 0; smoothing keeps it finite."""
    import math

    (r,) = q(spark, sf_dir, "logloss_quantity_model").collect()
    assert 0.0 < r["logloss"] < math.log(2) * 1.5  # finite, sane for binary


def test_randomized_response_debiases(spark, sf_dir):
    """The RR estimator must land near the true rate (binomial noise of
    the 1/4 flip coin: 5 sigma of 0.5*sqrt(p_f(1-p_f)/n) around truth),
    and the reported count must actually differ from the true count
    (privacy was applied)."""
    r = q(spark, sf_dir, "randomized_response_rate").collect()[0]
    assert r.n_reported != r.n_true
    sigma = (0.25 * 0.75 / r.n) ** 0.5 / 0.5
    assert abs(r.debiased_rate - r.true_rate) < 5 * sigma


def test_dp_noise_is_applied_and_bounded(spark, sf_dir):
    """Every released aggregate is perturbed (no group escapes noising)
    and the Laplace magnitudes respect the u in [0,1) inverse-CDF bound
    |x| <= b*ln(1e12); count noise uses b=1, sum noise b=100."""
    from convex_batch_processor_spark.catalog import load_table

    released = {r.event_type: r for r in q(spark, sf_dir, "dp_noisy_counts_by_type").collect()}
    truth = {
        r.event_type: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.least(F.col("value"), F.lit(100.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert set(released) == set(truth)
    max_b1 = 12 * 2.302585093  # ln(1e12)
    for et, r in released.items():
        assert r.noisy_count != truth[et].c
        assert abs(r.noisy_count - truth[et].c) <= max_b1 + 1e-6
        assert abs(r.noisy_sum - truth[et].s) <= 100 * max_b1 + 1e-6


def test_k_anonymity_partition_is_consistent(spark, sf_dir):
    """Suppressed + published rows account for every document, and any
    language with a small group suppresses at least one row."""
    from convex_batch_processor_spark.catalog import load_table

    rows = q(spark, sf_dir, "k_anonymity_audit").collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.rows_suppressed + r.rows_published for r in rows) == n_docs
    for r in rows:
        assert (r.small_groups == 0) == (r.rows_suppressed == 0)
        assert r.min_group <= r.max_group


def test_zlib_class_ratios_order_as_entropy_predicts():
    """Deflate must compress the repetitive class far better than the
    high-entropy hex class (the signal the quality filter relies on),
    and the pinned oracle constants must reproduce under a fresh
    compression call."""
    import zlib

    from convex_batch_processor_spark.queries.llm48 import _ZCOMP, _ZLEVEL, _ZPAY

    ratios = {
        k: len(zlib.compress(v.encode(), _ZLEVEL)) / len(v.encode())
        for k, v in _ZPAY.items()
    }
    assert ratios[0] < 0.2 < ratios[1]
    for k, v in _ZPAY.items():
        assert len(zlib.compress(v.encode(), _ZLEVEL)) == _ZCOMP[k]
