"""The round-11 surface pack (REGISTERED late round 10 — the stale-green
backlog cleared with the r10 rotation, lifting the registry freeze per
NOTES §"Post-freeze surface plan" / VERDICT r9 #4).

These are the runnable candidates from NOTES §"Post-freeze surface
plan", built and oracle-paired in round 9 AHEAD of registration (two
rounds of parity/fixture/property/scale green before a driver slot).
The pack registers at the BACK of the registry — outside the round-10
driver window — and rotates to the front of the round-11 window.
``tests/test_r11_preflight.py`` runs every entry through the same
compare() harness the fixture gates use, at sf0.001, a crafted boundary
fixture, AND sf0.1 (the rounding-tie tier).

Provenance: these extend the reference's batch-processing surface
(blocknavi/convex-batch-processor, src/lib.ts — per-key aggregation and
retention state machines) with the LLM-training-data operators the
task brief names as first-class; none have a reference counterpart.

Determinism: the round-7/8 recipes throughout — exact integer counts
until one double division, leaf-rounded transcendentals at 9 dp,
decimal accumulation for order-independent sums, division-free guard
conditions, NULLS-safe key filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..llmops.dedup import positional_gram_array, positional_gram_index, tokens_col
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# name -> (fn, oracle_sql) — kept as the pre-flight harness's index
# (tests/test_r11_preflight.py and tests/scale_check.py parametrize
# over it); registration happens at the bottom of the module.
CANDIDATES: dict[str, tuple] = {}


def _candidate(name: str, oracle: str | None = None):
    def deco(fn):
        CANDIDATES[name] = (fn, oracle)
        return fn

    return deco


# --- 1. exact-substring dedup via positional n-gram chains -------------------

_SPAN_N = 8  # gram width (tokens)


@_candidate(
    "substring_dedup_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
    g AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i + {_SPAN_N - 1}], ' ') AS gram
        FROM toks, unnest(range(1, len(t) - {_SPAN_N - 2})) AS r(i)
        WHERE len(t) >= {_SPAN_N}),
    nd AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
    dp AS (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM g JOIN nd USING (gram)),
    runs AS (
        SELECT doc_id, pos - rn AS grp, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM dp GROUP BY 1, 2)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_runs,
           CAST(MAX(run_len) + {_SPAN_N - 1} AS BIGINT) AS longest_span_tokens,
           CAST(SUM(run_len) AS BIGINT) AS n_dup_positions
    FROM runs GROUP BY doc_id
    """,
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication spans per document — the bounded
    stand-in for suffix-array substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): a token position is
    DUPLICATED if its 8-gram (_SPAN_N) occurs in >= 2 docs; consecutive
    duplicated positions chain into a span (gaps-and-islands), so a
    K-position run = a shared substring of K+7 tokens.
    Emits per-doc run count, longest span, and duplicated-position count
    (docs with zero duplicated positions emit no row).

    Scale: positional gram explode (map-side) -> ONE gram-keyed shuffle
    for document frequency -> join back on the gram key -> per-doc
    window over the doc's OWN positions. Candidate volume is sum-of-
    positions, never doc x doc; the islands window partitions by doc_id
    (uniform keys). Spark pos is 0-based vs the oracle's 1-based unnest,
    but the islands key pos - row_number() is translation-invariant."""
    docs = _t(spark, sf_dir, "documents")
    # shared gram stream + cross-doc duplicated-gram set (persisted by
    # the helper's two-consumer contract); llm73's scrub accounting
    # reads the SAME helper so the two queries stay one policy
    g, nd = positional_gram_index(docs, _SPAN_N)
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        g.join(nd, "gram")
        .select("doc_id", "pos")
        .withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_runs"),
        (F.max("run_len") + F.lit(_SPAN_N - 1)).alias("longest_span_tokens"),
        F.sum("run_len").alias("n_dup_positions"),
    )


# --- 2. Kneser-Ney-smoothed bigram LM scoring --------------------------------

_KN_D = 0.75  # the standard fixed discount


@_candidate(
    "kneser_ney_doc_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
    bg AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(range(1, len(t))) AS r(i)
        WHERE len(t) >= 2),
    cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2),
    c1 AS (
        SELECT w1, CAST(SUM(c) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1f
        FROM cb GROUP BY 1),
    rev AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r FROM cb GROUP BY 1),
    tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM cb),
    lp AS (
        SELECT bg.doc_id,
               round(ln(((CAST(cb.c AS DOUBLE) - {_KN_D})
                         + (({_KN_D} * CAST(c1.n1f AS DOUBLE))
                            * (CAST(rev.n1r AS DOUBLE) / CAST(tt.t AS DOUBLE))))
                        / CAST(c1.c1 AS DOUBLE)), 9) AS logp
        FROM bg
        JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
        JOIN c1 ON c1.w1 = bg.w1
        JOIN rev ON rev.w2 = bg.w2
        CROSS JOIN tt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CAST(logp AS DECIMAL(18,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS mean_logp
    FROM lp GROUP BY doc_id
    """,
)
def kneser_ney_doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean interpolated-Kneser-Ney bigram log-probability
    (fixed discount D=0.75, _KN_D) — the n-gram LM quality score a curation
    pipeline uses where a neural perplexity model is too expensive:
    P(w2|w1) = max(c-D,0)/c(w1.) + (D*N1+(w1.)/c(w1.)) * N1+(.w2)/|types|.
    Every observed bigram has c >= 1 > D, so the max() never clips.

    Determinism: all five statistics are exact integers; the probability
    is one fixed-shape double expression (identical parenthesization in
    both engines), ln leaf-rounded to 9 dp, per-doc mean accumulated in
    DECIMAL(18,9) (order-independent) with one final double division.

    Scale: bigram explode (map-side) -> ONE (w1,w2)-keyed shuffle for
    counts; c1/n1f/rev/T are aggregates OF that bounded type table
    (vocabulary-bounded, never corpus-scale); the join back to the
    occurrence stream is bigram-keyed (uniform md5-like distribution of
    word pairs). |types| joins as a one-row broadcast."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select("doc_id", tokens_col("text").alias("t")).filter(
        F.size("t") >= 2
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at("t", i).alias("w1"),
            F.element_at("t", i + F.lit(1)).alias("w2"),
        ),
    )
    # Deliberate session-lifetime caches: bg feeds the count table AND the
    # scoring join-back; cb feeds c1/rev/tt AND the join — without persist
    # the bigram explode re-runs once per consumer (the multi-consumer
    # class the repo prices at 4-6x; ADVICE r9). LRU-evictable; the plan
    # is lazy, so the unpersist point is the caller's last action.
    bg = toks.select("doc_id", F.explode(pairs).alias("b")).select(
        "doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    ).persist()
    cb = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c")).persist()
    c1 = cb.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    rev = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n1r"))
    tt = F.broadcast(cb.agg(F.count(F.lit(1)).alias("t")))
    logp = F.round(
        F.log(
            (
                (F.col("c").cast("double") - F.lit(_KN_D))
                + (
                    (F.lit(_KN_D) * F.col("n1f").cast("double"))
                    * (F.col("n1r").cast("double") / F.col("t").cast("double"))
                )
            )
            / F.col("c1").cast("double")
        ),
        9,
    )
    lp = (
        bg.join(cb, ["w1", "w2"])
        .join(c1, "w1")
        .join(rev, "w2")
        .crossJoin(tt)
        .select("doc_id", logp.alias("logp"))
    )
    return lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("logp").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_logp"),
    )


# --- 3. HITS hubs/authorities on the part-supplier bipartite graph ----------

_HITS_ITERS = 3


def _hits_iter_sql(i: int) -> str:
    """One unrolled HITS iteration as SQL CTEs (exact-integer state)."""
    return f"""
    a{i} AS (
        SELECT e.s, CAST(SUM(h{i - 1}.score) AS DECIMAL(38,0)) AS score
        FROM e JOIN h{i - 1} ON h{i - 1}.p = e.p GROUP BY e.s),
    h{i} AS (
        SELECT e.p, CAST(SUM(a{i}.score) AS DECIMAL(38,0)) AS score
        FROM e JOIN a{i} ON a{i}.s = e.s GROUP BY e.p)"""


@_candidate(
    "hits_part_supplier",
    oracle=(
        """
    WITH e AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
    h0 AS (
        SELECT DISTINCT p, CAST(1 AS DECIMAL(38,0)) AS score FROM e),
    """
        + ",".join(_hits_iter_sql(i) for i in range(1, _HITS_ITERS + 1))
        + f""",
    atot AS (SELECT SUM(score) AS tot FROM a{_HITS_ITERS}),
    htot AS (SELECT SUM(score) AS tot FROM h{_HITS_ITERS})
    SELECT 'part_hub' AS node_type, p AS node_key,
           CAST(score AS DOUBLE) / CAST(tot AS DOUBLE) AS score
    FROM h{_HITS_ITERS} CROSS JOIN htot
    UNION ALL
    SELECT 'supplier_authority' AS node_type, s AS node_key,
           CAST(score AS DOUBLE) / CAST(tot AS DOUBLE) AS score
    FROM a{_HITS_ITERS} CROSS JOIN atot
    """
    ),
)
def hits_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the part-supplier bipartite graph
    (3 unrolled iterations, _HITS_ITERS, L1-normalized): parts that source
    from many well-connected suppliers are hubs; suppliers serving many
    hub parts are authorities — the supply-chain centrality twin of the
    PageRank query (llm8).

    Determinism: the iteration is LINEAR, so per-step L1 normalization
    is a scalar that factors out — normalizing ONCE at the end yields
    the identical direction with NO intermediate float state. Raw
    iterates are therefore exact integers (path counts; h0 = 1), kept in
    DECIMAL(38,0) so every SUM is an exact fold; the only float op in
    the whole query is the final raw/total division — deterministic
    bits, emitted UNROUNDED (rounding an exact-decimal ratio lands on
    .5e-9 ties the engines break differently; the sf0.1 pre-flight
    caught exactly that in two sibling candidates). An earlier draft
    normalized every step through a broadcast-total cross join: 6
    one-row-broadcast jobs plus rounding drift, and the nested
    agg-inside-crossJoin lineage hit the Catalyst optimization blowup
    (the bpe_apply class) — 26 s at sf0.001 vs ~1 s for this form.

    Scale: the edge list is |distinct (part,supplier)| (persisted once —
    deliberate session-lifetime cache, 7 consumers across the unrolled
    loop); each iteration is two edge-keyed equi-join + aggregate pairs,
    the textbook Pregel step as DataFrame ops; the two normalization
    totals are one-row broadcasts at the end. Path counts reach
    ~degree^6 — DECIMAL(38,0) holds 1e38, far beyond any real degree
    distribution."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct().persist()
    h = e.select("p").distinct().select(
        "p", F.lit(1).cast("decimal(38,0)").alias("score")
    )
    a = None
    for _ in range(_HITS_ITERS):
        a = (
            e.join(h.withColumnRenamed("score", "hs"), "p")
            .groupBy("s")
            .agg(F.sum("hs").cast("decimal(38,0)").alias("score"))
        )
        h = (
            e.join(a.withColumnRenamed("score", "as_"), "s")
            .groupBy("p")
            .agg(F.sum("as_").cast("decimal(38,0)").alias("score"))
        )
    atot = F.broadcast(a.agg(F.sum("score").alias("tot")))
    htot = F.broadcast(h.agg(F.sum("score").alias("tot")))
    hubs = h.crossJoin(htot).select(
        F.lit("part_hub").alias("node_type"),
        F.col("p").alias("node_key"),
        (F.col("score").cast("double") / F.col("tot").cast("double"))
        .alias("score"),
    )
    auth = a.crossJoin(atot).select(
        F.lit("supplier_authority").alias("node_type"),
        F.col("s").alias("node_key"),
        (F.col("score").cast("double") / F.col("tot").cast("double"))
        .alias("score"),
    )
    return hubs.unionAll(auth)


# --- 4. RankGauss (inverse-normal quantile transform) ------------------------

# Acklam's rational approximation to the inverse normal CDF (public
# domain constants; relative error < 1.15e-9 — well inside the 9-dp
# leaf rounding). ONE expression string drives BOTH engines (Spark via
# F.expr, DuckDB verbatim), so branch selection and float op order are
# identical by construction.
_ACK = dict(
    a1="-3.969683028665376e+01", a2="2.209460984245205e+02",
    a3="-2.759285104469687e+02", a4="1.383577518672690e+02",
    a5="-3.066479806614716e+01", a6="2.506628277459239e+00",
    b1="-5.447609879822406e+01", b2="1.615858368580409e+02",
    b3="-1.556989798598866e+02", b4="6.680131188771972e+01",
    b5="-1.328068155288572e+01",
    c1="-7.784894002430293e-03", c2="-3.223964580411365e-01",
    c3="-2.400758277161838e+00", c4="-2.549732539343734e+00",
    c5="4.374664141464968e+00", c6="2.938163982698783e+00",
    d1="7.784695709041462e-03", d2="3.224671290700398e-01",
    d3="2.445134137142996e+00", d4="3.754408661907416e+00",
    p_low="0.02425",
)


def _acklam_sql(p: str) -> str:
    """Inverse normal CDF of expression ``p`` (must be in (0,1))."""
    k = _ACK
    low_q = f"sqrt(-2.0 * ln({p}))"
    high_q = f"sqrt(-2.0 * ln(1.0 - ({p})))"

    def tail(q: str) -> str:
        num = (f"((((({k['c1']} * {q} + {k['c2']}) * {q} + {k['c3']}) * {q} "
               f"+ {k['c4']}) * {q} + {k['c5']}) * {q} + {k['c6']})")
        den = (f"(((({k['d1']} * {q} + {k['d2']}) * {q} + {k['d3']}) * {q} "
               f"+ {k['d4']}) * {q} + 1.0)")
        return f"({num} / {den})"

    mid_q = f"(({p}) - 0.5)"
    mid_r = f"({mid_q} * {mid_q})"
    mid_num = (f"((((({k['a1']} * {mid_r} + {k['a2']}) * {mid_r} + {k['a3']}) "
               f"* {mid_r} + {k['a4']}) * {mid_r} + {k['a5']}) * {mid_r} "
               f"+ {k['a6']}) * {mid_q}")
    mid_den = (f"((((({k['b1']} * {mid_r} + {k['b2']}) * {mid_r} + {k['b3']}) "
               f"* {mid_r} + {k['b4']}) * {mid_r} + {k['b5']}) * {mid_r} + 1.0)")
    return (
        f"CASE WHEN ({p}) < {k['p_low']} THEN {tail(low_q)} "
        f"WHEN ({p}) > 1.0 - {k['p_low']} THEN -{tail(high_q)} "
        f"ELSE ({mid_num}) / {mid_den} END"
    )


@_candidate(
    "rank_gauss_prices",
    oracle=f"""
    WITH ranked AS (
        SELECT o.o_orderkey, c.c_mktsegment AS segment,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice NULLS FIRST, o.o_orderkey) AS r,
               COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    p AS (
        SELECT o_orderkey, segment, CAST(r AS BIGINT) AS r,
               CAST(r AS DOUBLE) / CAST(n + 1 AS DOUBLE) AS pv
        FROM ranked)
    SELECT o_orderkey, segment, r,
           round({_acklam_sql("pv")}, 9) AS gauss
    FROM p
    """,
)
def rank_gauss_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RankGauss: per-market-segment inverse-normal quantile transform of
    order prices (rank r -> p = r/(n+1) -> Phi^-1(p) via Acklam's
    rational approximation) — the feature transform that makes heavy-
    tailed monetary columns Gaussian for embedding/NN training.

    Determinism: the rank is a total order ((price, orderkey) tiebreak,
    no NULLs), p = r/(n+1) is one exact-integer division, and the SAME
    expression string (_acklam_sql) is compiled by both engines — branch
    boundaries and float op order are identical by construction; the
    leaf rounds at 9 dp (the approximation's own error is < 1.15e-9).

    Scale: one shuffle on c_custkey for the join (orders-side is the big
    table; customer broadcasts at real scale), one shuffle on segment
    for the window. |segments| is small, so at 100 TB the per-segment
    window is the skew point — the production path is two-phase range
    partitioning within segment (rank via distributed sort), which Spark
    SQL's window already executes as a sort within partitions; the
    transform itself stays map-side after the rank."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
    )
    # NULLS FIRST pinned on BOTH sides (the r8 rule: Spark windows sort
    # NULLS FIRST, DuckDB NULLS LAST — a NULL price must rank the same)
    w = Window.partitionBy("segment").orderBy(
        F.col("o_totalprice").asc_nulls_first(), "o_orderkey"
    )
    wn = Window.partitionBy("segment")
    ranked = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "segment", "o_totalprice")
        .withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "pv", F.col("r").cast("double") / (F.col("n") + 1).cast("double")
        )
    )
    return ranked.select(
        "o_orderkey",
        "segment",
        F.col("r").cast("long").alias("r"),
        F.round(F.expr(_acklam_sql("pv")), 9).alias("gauss"),
    )


# --- 5. temperature-scaled mixing weights ------------------------------------

_TAUS = (0.3, 0.7)


@_candidate(
    "temperature_mix_weights",
    oracle=f"""
    WITH c AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL GROUP BY source),
    p AS (
        SELECT source, n_tokens,
               CAST(round(pow(CAST(n_tokens AS DOUBLE), {_TAUS[0]}), 9)
                    AS DECIMAL(18,9)) AS w03,
               CAST(round(pow(CAST(n_tokens AS DOUBLE), {_TAUS[1]}), 9)
                    AS DECIMAL(18,9)) AS w07
        FROM c),
    t AS (SELECT SUM(w03) AS t03, SUM(w07) AS t07 FROM p)
    SELECT source, n_tokens,
           CAST(w03 AS DOUBLE) / CAST(t03 AS DOUBLE) AS weight_t03,
           CAST(w07 AS DOUBLE) / CAST(t07 AS DOUBLE) AS weight_t07
    FROM p CROSS JOIN t
    """,
)
def temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source-mixing weights: w_tau(source) =
    c^tau / sum(c^tau) over per-source token counts, at tau in
    (0.3, 0.7) (_TAUS) —
    the generalization of sqrt-mixing (mixture_weights_sqrt, tau=0.5)
    used to up-weight low-resource sources when composing a training mix
    (tau<1 flattens, tau=1 is proportional).

    Determinism: token counts are exact integers; pow is leaf-rounded to
    9 dp and pinned to DECIMAL(18,9) so the normalization total is an
    exact decimal fold; one final double division per tau.

    Scale: one shuffle (groupBy source, |sources| bounded); the totals
    join back as a one-row broadcast. Token counting is map-side
    size(split()) — no explode."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    c = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col("text"))).alias("n_tokens")
    )
    p = c.select(
        "source",
        "n_tokens",
        *[
            F.round(F.pow(F.col("n_tokens").cast("double"), F.lit(tau)), 9)
            .cast("decimal(18,9)")
            .alias(f"w{int(tau * 10):02d}")
            for tau in _TAUS
        ],
    )
    t = F.broadcast(
        p.agg(F.sum("w03").alias("t03"), F.sum("w07").alias("t07"))
    )
    return p.crossJoin(t).select(
        "source",
        "n_tokens",
        (F.col("w03").cast("double") / F.col("t03").cast("double"))
        .alias("weight_t03"),
        (F.col("w07").cast("double") / F.col("t07").cast("double"))
        .alias("weight_t07"),
    )


# --- 6. deterministic per-stratum reservoir sample ---------------------------

_RES_K = 20


@_candidate(
    "stratified_reservoir_sample",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk
        FROM documents),
    r AS (
        SELECT doc_id, lang, hk,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hk, doc_id)
                   AS sample_rank
        FROM h)
    SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= {_RES_K}
    """,
)
def stratified_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum reservoir sample: top-20 (_RES_K) docs per
    language by md5(doc_id) — the distributed equivalent of a seeded
    reservoir (a uniform hash order IS a random permutation, and unlike
    rand() it is reproducible across engines, retries, and partitions;
    the same recipe as sampled_by_lang's systematic sampler, reservoir-
    shaped).

    Scale: one lang-keyed shuffle; the per-stratum rank is a bounded
    TakeOrdered (k=20) once Spark pushes the filter into the sort —
    no full sort of the corpus is retained. Hash keys are uniform, so
    strata skew only as the underlying language mix does."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.md5(F.col("doc_id").cast("string").cast("binary")).alias("hk"),
        )
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _RES_K)
        .select("doc_id", "lang", F.col("sample_rank").cast("long").alias("sample_rank"))
    )


# --- 7. multi-keyword tagging (broadcast keyword table) -----------------------

_KEYWORDS = ("spark", "merge", "window", "vector", "stream", "hash")


@_candidate(
    "keyword_tag_counts",
    oracle=f"""
    WITH kw(kw) AS (VALUES {", ".join(f"('{k}')" for k in _KEYWORDS)}),
    tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_kw
    FROM tok JOIN kw ON kw.kw = tok.tok
    GROUP BY doc_id
    """,
)
def keyword_tag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-keyword document tagging: per-doc hit count and distinct
    matched keywords against a dictionary — the FlashText/Aho-Corasick
    curation primitive (topic tagging, blocklists) expressed as a
    broadcast join on exact tokens (at real dictionary sizes the
    broadcast hash join IS the trie: one probe per token).

    Scale: token explode (map-side) -> broadcast join against the
    dictionary (no shuffle of the corpus) -> one doc-keyed reduce. Docs
    with zero hits emit no row (the join filters them before the
    shuffle, so the reduce sees only matching tokens)."""
    spark_kw = F.broadcast(
        spark.createDataFrame([(k,) for k in _KEYWORDS], "tok string")
    )
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    return (
        tok.join(spark_kw, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("tok").alias("n_distinct_kw"),
        )
    )


# --- 8. discrete-time tenure hazard table ------------------------------------


@_candidate(
    "tenure_hazard_table",
    oracle="""
    WITH u AS (
        SELECT user_id,
               date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
                   AS tenure_d
        FROM events WHERE ts IS NOT NULL GROUP BY user_id),
    ends AS (
        SELECT tenure_d, CAST(COUNT(*) AS BIGINT) AS n_ending
        FROM u GROUP BY tenure_d),
    risk AS (
        SELECT tenure_d, n_ending,
               CAST(SUM(n_ending) OVER (
                   ORDER BY tenure_d DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_at_risk
        FROM ends)
    SELECT CAST(tenure_d AS INTEGER) AS tenure_day, n_ending, n_at_risk,
           CAST(n_ending AS DOUBLE) / CAST(n_at_risk AS DOUBLE) AS hazard
    FROM risk
    """,
)
def tenure_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival hazard by user tenure: h(d) = P(a user's
    observed activity span ends at day d | it reached day d) =
    n_ending(d) / n_at_risk(d) — the churn-curve primitive (Kaplan-Meier
    discrete twin) over the events stream. n_at_risk is the reverse
    cumulative of n_ending, so n_at_risk >= n_ending >= 1: the division
    can never see zero.

    Scale: one user-keyed shuffle for the min/max span, one tiny
    aggregate over |distinct tenures| rows; the reverse-cumulative
    window is global BUT runs over that bounded day-histogram, the
    audited bounded-global-window class (tenure_day has no NULLs — the
    ts filter precedes the datediff)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    u = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts").cast("date"), F.min("ts").cast("date")).alias(
            "tenure_d"
        )
    )
    ends = u.groupBy("tenure_d").agg(F.count(F.lit(1)).alias("n_ending"))
    w = (
        Window.orderBy(F.col("tenure_d").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ends.withColumn("n_at_risk", F.sum("n_ending").over(w))
        .select(
            F.col("tenure_d").cast("int").alias("tenure_day"),
            "n_ending",
            "n_at_risk",
            (
                F.col("n_ending").cast("double")
                / F.col("n_at_risk").cast("double")
            ).alias("hazard"),
        )
    )


# --- 9. per-dimension embedding standardization stats -------------------------


@_candidate(
    "embedding_dim_standardize",
    oracle="""
    WITH el AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE), 6)
                    AS DECIMAL(12,6)) AS e
        FROM embeddings),
    m AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(e) AS DOUBLE) AS s,
               CAST(SUM(CAST(e * e AS DECIMAL(25,12))) AS DOUBLE) AS sq,
               CAST(COUNT(*) AS DOUBLE) AS nd
        FROM el GROUP BY dim)
    SELECT CAST(dim AS INTEGER) AS dim, n,
           s / nd AS mean,
           CASE WHEN ((sq - ((s * s) / nd)) / nd) > 0
                THEN sqrt((sq - ((s * s) / nd)) / nd)
                ELSE 0.0 END AS std
    FROM m
    """,
)
def embedding_dim_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/std over the embedding column — the
    standardization (diagonal-whitening) statistics pass every
    embedding-space pipeline runs before cosine/L2 work; the portable
    half of ZCA whitening (the full rotation stays rows-only per NOTES
    §"Post-freeze surface plan" #10).

    Determinism: each element is rounded to 6 dp (double->double, the
    vector_stats/ivf-centroid recipe) and accumulated in DECIMAL — sum
    in (12,6), sum-of-squares in (25,12), both exact and order-
    independent; mean/var are fixed-shape double expressions; the
    population-variance guard is division-by-n only (n >= 1 by
    construction — a group exists only if it has rows). Spark's
    posexplode position is 0-based vs generate_subscripts' 1-based: +1.

    Scale: posexplode is map-side; ONE shuffle on the 64-value dim key;
    output is |dims| rows. At 100 TB the same plan holds — the dim key
    is low-cardinality but each partial aggregate is a single decimal
    pair, so the tree-aggregate combiners absorb the fan-in."""
    emb = _t(spark, sf_dir, "embeddings")
    e6 = F.round(F.col("e").cast("double"), 6).cast("decimal(12,6)")
    el = emb.select(F.posexplode("embedding").alias("pos", "e")).select(
        (F.col("pos") + 1).alias("dim"), e6.alias("e")
    )
    m = el.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e").cast("double").alias("s"),
        F.sum((F.col("e") * F.col("e")).cast("decimal(25,12)"))
        .cast("double")
        .alias("sq"),
        F.count(F.lit(1)).cast("double").alias("nd"),
    )
    var = (F.col("sq") - ((F.col("s") * F.col("s")) / F.col("nd"))) / F.col("nd")
    return m.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        (F.col("s") / F.col("nd")).alias("mean"),
        F.when(var > 0, F.sqrt(var)).otherwise(F.lit(0.0)).alias("std"),
    )


# --- 10. best-fit-decreasing sequence packing (rows-only) ---------------------

_PACK_CAP = 512


@_candidate("pack_best_fit_decreasing", oracle=None)
def pack_best_fit_decreasing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-fit-decreasing bin packing of documents into 512-token
    (_PACK_CAP) training sequences, per source shard: sort docs by (n_tokens DESC,
    doc_id), place each into the FULLEST bin that still fits (ties ->
    lowest bin id), open a new bin otherwise; an oversize doc gets a
    singleton bin. BFD wastes provably <= 11/9 OPT + 4 bins vs greedy
    first-fit's looser bound — measurably fewer padding tokens on
    heavy-tailed length distributions (upgrades llmops.packing's
    sequential first-fit, NOTES §"Post-freeze surface plan" #8).

    Rows-only by documented contract: the bin assignment is an
    inherently sequential per-shard loop, not one SQL query —
    tests/test_r11_preflight.py pins byte parity against a pure-Python
    reference plus the SQL-checkable invariants (no bin over capacity
    except singletons, every doc packed exactly once).

    Scale: applyInPandas per source shard (the pack_greedy recipe) — the
    loop is O(docs x bins) per SHARD, never global; shards are
    independent and the shuffle key is the source column. A production
    variant keeps bins in a fill-ordered heap for O(docs log bins)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = docs.select(
        "source", "doc_id", F.size(tokens_col("text")).cast("int").alias("n_tokens")
    )
    cap = _PACK_CAP

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list = []  # bin_id -> current fill
        out = []
        for nt in pdf["n_tokens"]:
            best, best_fill = -1, -1
            if nt <= cap:
                for b, f in enumerate(fills):
                    if f + nt <= cap and f > best_fill:
                        best, best_fill = b, f
            if best < 0:
                best = len(fills)
                fills.append(0)
            fills[best] += nt
            out.append(best)
        pdf["bin_id"] = pd.Series(out, dtype="int64")
        return pdf[["source", "doc_id", "n_tokens", "bin_id"]]

    schema = "source string, doc_id long, n_tokens int, bin_id long"
    return sized.groupBy("source").applyInPandas(pack, schema=schema)


# --- 11. ZCA whitening matrix (rows-only) -------------------------------------

_ZCA_EPS = 1e-6


@_candidate("zca_whitening_matrix", oracle=None)
def zca_whitening_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening matrix W = U diag(1/sqrt(lambda + 1e-6)) U^T (_ZCA_EPS) of
    the embedding covariance — the rotation-preserving whitening used to
    decorrelate embedding spaces before cosine retrieval (the portable
    diagonal half lives in embedding_dim_standardize; the full rotation
    is rows-only per NOTES §"Post-freeze surface plan" #10 — an
    eigendecomposition is not one SQL query). Emits the dense (dim_i,
    dim_j, w) matrix, 1-based dims.

    Distribution: per-Arrow-batch partial moments (n, sum, X^T X) via
    mapInPandas — each batch reduces to ONE 1 + d + d^2 row, so the
    driver collects O(partitions) bounded rows (the documented
    control-plane collect class: centroids/manifests/vocab), combines
    with numpy, and eigendecomposes the d x d covariance. The corpus is
    never collected and never shuffled; d=64 keeps the driver state at
    4096 doubles. Parity: tests pin allclose against a pure-numpy
    reference on the same vectors plus the W @ cov @ W ~= I and
    symmetry invariants."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())

    def moments(batches):
        import pandas as pd

        for pdf in batches:
            vecs = [v for v in pdf["embedding"] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.DataFrame(
                {
                    "n": [int(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "ss": [(x.T @ x).reshape(-1).tolist()],
                }
            )

    parts = emb.select("embedding").mapInPandas(
        moments, "n long, s array<double>, ss array<double>"
    ).collect()
    if not parts:
        return spark.createDataFrame([], "dim_i int, dim_j int, w double")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    ss = np.sum([np.asarray(p["ss"]) for p in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    lam, u = np.linalg.eigh(cov)
    w = u @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + _ZCA_EPS)) @ u.T
    rows = [
        (i + 1, j + 1, float(w[i, j])) for i in range(d) for j in range(d)
    ]
    return spark.createDataFrame(rows, "dim_i int, dim_j int, w double")


# --- 12. multi-token phrase tagging (positional n-gram join) ------------------

_PHRASES = (
    "table scan", "merge join", "hash join", "sort merge",
    "sort merge join", "table scan merge",
)


def _phrase_values_sql() -> str:
    return ", ".join(
        f"('{p}', {len(p.split())})" for p in _PHRASES
    )


@_candidate(
    "phrase_tag_spans",
    oracle=f"""
    WITH ph(phrase, plen) AS (VALUES {_phrase_values_sql()}),
    toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
    g AS (
        SELECT doc_id, plen, i AS pos,
               array_to_string(t[i:i + plen - 1], ' ') AS gram
        FROM toks
        CROSS JOIN (SELECT DISTINCT plen FROM ph) pl
        , unnest(range(1, len(t) - plen + 2)) AS r(i)
        WHERE len(t) >= plen)
    SELECT g.doc_id, ph.phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(g.pos) AS BIGINT) AS first_pos
    FROM g JOIN ph ON ph.phrase = g.gram AND ph.plen = g.plen
    GROUP BY 1, 2
    """,
)
def phrase_tag_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-token phrase tagging: per (doc, phrase) occurrence count and
    first token position against a phrase dictionary of mixed lengths —
    the Aho-Corasick-class curation primitive for license-boilerplate /
    blocklist-phrase detection that single-token tagging
    (keyword_tag_counts) cannot express. Overlapping matches all count
    ('sort merge join' also yields 'merge join' and 'sort merge' at
    their own positions); positions are 1-based token indices.

    Scale: ONE positional gram explode per DISTINCT phrase length (the
    dictionary's length set is tiny and fixed), then a broadcast join
    against the phrase table — at real dictionary sizes the broadcast
    hash join IS the automaton: one probe per (position, length). The
    corpus never shuffles; the only shuffle is the final (doc, phrase)
    reduce. Candidate volume is sum-of-positions x |length set|, never
    corpus x dictionary."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select("doc_id", tokens_col("text").alias("t"))
    lengths = sorted({len(p.split()) for p in _PHRASES})
    ph = F.broadcast(
        spark.createDataFrame(
            [(p, len(p.split())) for p in _PHRASES], "phrase string, plen int"
        )
    )
    streams = []
    for plen in lengths:
        # the shared helper owns the F.transform lambda-arity footgun
        # (a binary default-arg lambda silently gets the array index)
        grams = positional_gram_array("t", plen)
        streams.append(
            toks.filter(F.size("t") >= plen)
            .select(
                "doc_id",
                F.lit(plen).alias("plen"),
                F.posexplode(grams).alias("pos0", "gram"),
            )
            # Spark posexplode is 0-based; the contract (and DuckDB's
            # unnest(range(1, ...))) is 1-based token positions
            .select("doc_id", "plen", (F.col("pos0") + 1).alias("pos"), "gram")
        )
    g = streams[0]
    for s in streams[1:]:
        g = g.unionAll(s)
    return (
        g.join(ph, (ph.phrase == g.gram) & (ph.plen == g.plen))
        .groupBy("doc_id", "phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").cast("long").alias("first_pos"),
        )
    )


# --- registration (freeze lifted late round 10) -------------------------------
# Every candidate above shipped two rounds of pre-flight green (DuckDB
# parity at sf0.001 + sf0.01 + sf0.1, crafted boundary fixture,
# partition-invariance probe, property tests, scale sweep) before this
# loop ran — the NOTES registration rule: pre-flight BEFORE registering,
# in the same module.
for _name, (_fn, _oracle) in CANDIDATES.items():
    register(_name, _oracle)(_fn)
del _name, _fn, _oracle
