"""Round-3 LLM-pipeline queries: corpus quality/repetition rules, mixture
weighting, curriculum bucketing, per-source caps, TF-IDF term selection,
int8 embedding quantization, and unsupervised k-means clustering.

Registered after llm2 (first driver check this round) so these also land
inside the driver's top-50 correctness window. Same oracle discipline as
queries/llm.py: integer-count ratios stay unrounded (bit-stable division),
float folds use the proven list_dot_product ≡ zip_with/aggregate pairing,
ln() is rounded to 9 dp at the leaf, and every top-k has a total-order
tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..llmops import similarity as S
from ..llmops import textstats as X
from ..llmops.dedup import tokens_col
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- quality / repetition rules --------------------------------------------

@register(
    "gopher_quality_filter",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    )
    SELECT doc_id, len(toks) AS n_words,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
               / len(toks) AS mean_word_len,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_frac,
           len(list_intersect(toks, ['the','a','and','of','to','in'])) > 0
               AS has_stopword,
           (len(toks) BETWEEN 10 AND 100000)
               AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                    / len(toks) BETWEEN 2.0 AND 10.0)
               AND (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) >= 0.3)
               AND (len(list_intersect(toks, ['the','a','and','of','to','in'])) > 0)
               AS keep
    FROM t WHERE len(toks) > 0
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (length band, mean word length,
    repetition via distinct-token fraction, stopword presence) — one
    map-side pass, no shuffle (llmops/textstats.py:gopher_quality)."""
    return X.gopher_quality(_t(spark, sf_dir, "documents"))


@register(
    "repetition_top_bigram",
    oracle="""
    WITH t AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id,
               toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS bg
        FROM t, unnest(range(1, len(toks))) AS r(i)
        WHERE len(toks) >= 2
    ),
    c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           CAST(MAX(cnt) AS BIGINT) AS top_count,
           CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS BIGINT) AS top_frac
    FROM c GROUP BY doc_id
    """,
)
def repetition_top_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detector: fraction of a doc's word-bigram occurrences
    taken by its most frequent bigram (the Gopher top-n-gram rule).

    ZERO-shuffle plan: instead of explode → groupBy(doc, bigram) →
    groupBy(doc) (two corpus-scale shuffles), sort each doc's bigram array
    and fold it — equal bigrams are adjacent after the sort, so the top
    count is the longest equal run. Pure per-row Column math; at 100 TB
    this is a map-only stage."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens_col("text").alias("toks")
    ).filter(F.size("toks") >= 2)
    bgs = F.array_sort(
        F.zip_with(
            F.slice("toks", 1, F.size("toks") - 1),
            F.slice("toks", 2, F.size("toks") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    d = toks.select("doc_id", bgs.alias("bgs"))
    zero = F.lit(0).cast("long")
    top = F.aggregate(
        F.col("bgs"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            zero.alias("run"),
            zero.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return d.select(
        "doc_id",
        F.size("bgs").cast("long").alias("n_bigrams"),
        top.alias("top_count"),  # materialized once; frac derives from it
    ).select(
        "doc_id",
        "n_bigrams",
        "top_count",
        (F.col("top_count").cast("double") / F.col("n_bigrams")).alias("top_frac"),
    )


# --- mixture / sampling / curriculum ---------------------------------------

@register(
    "mixture_weights_sqrt",
    oracle="""
    WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY 1),
    w AS (SELECT lang, n_docs, round(sqrt(n_docs), 6) AS w_raw FROM c),
    t AS (SELECT CAST(SUM(CAST(w_raw AS DECIMAL(18,6))) AS DOUBLE) AS tot FROM w)
    SELECT lang, n_docs, w_raw, w_raw / t.tot AS weight FROM w, t
    """,
)
def mixture_weights_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture weights (α = 0.5): per-language
    sampling weight ∝ √count, normalized — the standard up-weighting of
    low-resource slices when composing a training mix. sqrt is IEEE
    correctly-rounded (engine-identical, unlike pow); the normalizer is a
    decimal-accumulated sum of the 6-dp-rounded weights so the total is
    order-independent. The weight is the RAW division w_raw/tot (rule
    14: both operands are exact 6-dp decimals, so the quotient is an
    exact rational and round(,9) of it is tie-divergent across engines;
    the unrounded division of identical doubles is bit-exact)."""
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = c.withColumn("w_raw", F.round(F.sqrt(F.col("n_docs")), 6))
    tot = w.agg(
        F.sum(F.col("w_raw").cast("decimal(18,6)")).cast("double").alias("tot")
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "w_raw",
        (F.col("w_raw") / F.col("tot")).alias("weight"),
    )


@register(
    "source_cap_sample",
    oracle="""
    SELECT doc_id, source, rn FROM (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ) WHERE rn <= 15
    """,
)
def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (domain-cap curation: no single crawl
    domain may dominate the mix): keep the 15 lowest-id docs per source —
    deterministic, re-runnable, and one window shuffle keyed by source."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
    )


@register(
    "length_curriculum_buckets",
    oracle="""
    SELECT bucket, COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        -- NULLS FIRST: Spark ranks NULL lengths first (ascending default),
        -- DuckDB's default is NULLS LAST — pin the shared convention
        SELECT n_chars, ntile(8) OVER (ORDER BY n_chars NULLS FIRST, doc_id) AS bucket
        FROM documents
    ) GROUP BY bucket
    """,
)
def length_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing: equal-count octiles of document length with
    per-bucket stats — EXACT ntile semantics with no global sort.

    The global rank comes from operators/rank.histogram_rank (the only
    unpartitioned window runs over the length histogram — ≤ max-doc-length
    rows regardless of corpus size), and the ntile bucket is then pure
    integer arithmetic on (rank, n): with q = n div 8, r = n mod 8, the
    first r buckets take q+1 rows — bucket = ceil(rank/(q+1)) in that
    prefix, else r + ceil((rank − r(q+1))/q). Bit-identical to
    ntile(8) OVER (ORDER BY n_chars, doc_id) (oracle unchanged), but no
    corpus row ever crosses a single-partition operator."""
    from ..operators.rank import histogram_rank

    docs = _t(spark, sf_dir, "documents")
    ranked = histogram_rank(
        docs.select("n_chars", "doc_id"), "n_chars", "doc_id", out_col="rnk"
    )
    ntot = docs.agg(F.count(F.lit(1)).alias("n"))
    bucket = F.expr(
        """CAST(CASE
             WHEN rnk <= (n % 8) * ((n div 8) + 1)
             THEN (rnk + (n div 8)) div ((n div 8) + 1)
             ELSE (n % 8) + (rnk - (n % 8) * ((n div 8) + 1) + (n div 8) - 1)
                  div greatest(n div 8, 1)
           END AS INT)"""
    )
    return (
        ranked.join(F.broadcast(ntot))
        .select("n_chars", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- retrieval-ish term weighting ------------------------------------------

@register(
    "tfidf_topk_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
        FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, term, tf, score FROM (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * round(ln((n.n_docs + 1.0) / (dft.df + 1.0)), 9) AS score,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * round(ln((n.n_docs + 1.0) / (dft.df + 1.0)), 9) DESC,
                            tf.term ASC
               ) AS rn
        FROM tf JOIN dft USING (term) CROSS JOIN n
    ) WHERE rn <= 5
    """,
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document — keyword extraction / indexing
    primitive. The document-frequency table is vocabulary-bounded and
    broadcast; the only corpus-scale shuffle is the (doc, term) count.
    ln() rounded to 9 dp at the leaf (the BM25 parity discipline); the
    score tf·idf9 is emitted UNROUNDED (rule 14: an integer times a
    ~9-dp decimal can land exactly on a 6-dp half, and re-rounding that
    tie diverges across engines — the raw product of identical doubles
    is bit-exact)."""
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = F.round(
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 9
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * idf)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "term", "tf", "score")
    )


# --- embedding ops ----------------------------------------------------------

@register(
    "embedding_quantize_int8",
    oracle="""
    WITH s AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x)))
                   / 127.0 AS scale
        FROM embeddings
    )
    SELECT vec_id, round(scale, 9) AS scale,
           CAST(list_sum(list_transform(v,
                x -> CAST(round(x / scale) AS BIGINT)
                     * CAST(round(x / scale) AS BIGINT))) AS BIGINT) AS qnorm,
           round(sqrt(list_dot_product(
               list_transform(v, x -> x - CAST(round(x / scale) AS BIGINT) * scale),
               list_transform(v, x -> x - CAST(round(x / scale) AS BIGINT) * scale)
           )), 6) AS recon_err
    FROM s WHERE scale > 0
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column with
    exact reconstruction-error accounting (llmops/similarity.py:
    quantize_int8). Map-side only — no shuffle at any corpus size."""
    return S.quantize_int8(_t(spark, sf_dir, "embeddings"))


# --- native session windows + bucketed range join ---------------------------

@register(
    "session_window_agg",
    oracle="""
    WITH s AS (
        -- ts IS NOT NULL mirrors Spark's native session_window, which
        -- DROPS rows with a NULL event time (probe-verified); without it
        -- the NULL row also re-orders per engine (NULLS FIRST vs LAST)
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
                    THEN 1 ELSE 0 END AS brk
        FROM events WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
        FROM s
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 6 HOUR AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native session windows (F.session_window, 6 h gap) — the
    merge-on-gap operator the streaming engine uses for session state,
    exercised in batch: per (user, session) event count + exact-decimal
    value sum, session_end = last event + gap (Spark's definition; the
    oracle replays it as a classic gaps-and-islands). One shuffle keyed by
    user — the same plan shape Structured Streaming maintains
    incrementally with watermark-evicted state."""
    ev = _t(spark, sf_dir, "events")
    from .registry import dsum

    return (
        ev.groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "view_purchase_attribution",
    oracle="""
    SELECT a.event_id AS src_event_id, b.event_id AS dst_event_id, a.user_id,
           date_diff('microsecond', a.ts, b.ts) AS delta_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'purchase'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
    """,
)
def view_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution interval join: purchases within 6 h after a view by the
    same user — via the bucketed range join (operators/rangejoin.py). The
    range predicate becomes an equi-join on (user, time-bucket): hot users
    spread across their timeline instead of concentrating in one sort-merge
    task, and there is no nested-loop fallback at any scale."""
    from ..operators.rangejoin import interval_join_bucketed

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("src_event_id"),
        "user_id",
        F.col("ts").alias("src_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("dst_event_id"),
        F.col("user_id"),
        F.col("ts").alias("dst_ts"),
    )
    out = interval_join_bucketed(
        views, purchases, ["user_id"], "src_ts", "dst_ts", 6 * 3600
    )
    return out.select(
        "src_event_id",
        "dst_event_id",
        "user_id",
        (F.unix_micros("dst_ts") - F.unix_micros("src_ts")).alias("delta_us"),
    )


def _semdedup_kmeans_oracle(
    k: int = 8, n_iter: int = 3, dim: int = 64, threshold: float = 0.42
) -> str:
    """SemDeDup replayed in SQL: the shared kmeans CTE chain (6-dp model
    rounding) → within-cluster cosine pairs (6-dp, the knn fold recipe) →
    recursive-CTE connected components (the neardup_components recipe) →
    min-id keeper labels."""
    from .sqlfrags import kmeans_assign, kmeans_ctes

    cos = (
        "round(list_dot_product(ea.v, eb.v) / "
        "(sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))), 6)"
    )
    return f"""
    WITH RECURSIVE {kmeans_ctes(k, n_iter, dim)},
    assign AS MATERIALIZED ({kmeans_assign(n_iter, dim)}),
    prs AS MATERIALIZED (
        -- env, not e: a NULL vector's cosine is NULL on both engines and
        -- can never pass the threshold, so it forms no pairs and stays a
        -- singleton component (DuckDB's list_dot_product would error on
        -- the NULL-element list before the comparison could say false)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assign a
        JOIN assign b ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        JOIN env ea ON ea.vec_id = a.vec_id
        JOIN env eb ON eb.vec_id = b.vec_id
        WHERE {cos} > {threshold}),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM prs
        UNION SELECT id_b, id_a FROM prs),
    reach(node, peer) AS (
        SELECT a, a FROM edges
        UNION
        SELECT r.node, g.b FROM reach r JOIN edges g ON g.a = r.peer),
    comp AS (SELECT node, MIN(peer) AS component_id FROM reach GROUP BY node)
    SELECT e.vec_id,
           coalesce(c.component_id, e.vec_id) AS component_id,
           coalesce(c.component_id, e.vec_id) = e.vec_id AS keep
    FROM e LEFT JOIN comp c ON c.node = e.vec_id
    """


@register("semantic_dedup_kmeans", oracle=_semdedup_kmeans_oracle())
def semantic_dedup_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup as published: k-means blocking → within-cluster cosine
    pairs → connected components → keep-min (llmops/cluster.py). The
    banded-LSH variant of the same contract is semantic_dedup_keep;
    tests assert the two agree on kept/dropped status for vectors whose
    pairs both blockings recover.

    ORACLE-CHECKED since round 4: every stage now has an exact replay —
    the 6-dp-rounded kmeans fit, the fold-parity cosine, and the
    recursive-CTE transitive closure — so the published algorithm's full
    keep/drop decision is hash-verified, not just property-tested."""
    from ..llmops.cluster import semantic_dedup_kmeans

    return semantic_dedup_kmeans(
        _t(spark, sf_dir, "embeddings"), k=8, n_iter=3, round_dp=6
    )


def _pq_oracle(m: int = 8, k: int = 16, n_iter: int = 3, dim: int = 64) -> str:
    """Product quantization replayed in SQL: one prefixed kmeans CTE chain
    per subspace (reproducible via round_dp=6), then per-subspace argmin
    encode and the same big-endian 4-bit pack the Spark query emits.
    recon_err sums the subspace distances in j order (matching the Spark
    fold) before one sqrt+round."""
    from .sqlfrags import kmeans_chain, kmeans_d2

    sub = dim // m
    d2 = kmeans_d2(sub)
    ctes = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    ]
    for j in range(m):
        # e{j} keeps ALL rows (a NULL vector encodes to code 0 per
        # subspace with NULL distance — the guarded d2 tiebreak);
        # env{j} feeds training, mirroring kmeans_fit's isNotNull filter
        ctes.append(
            f"e{j} AS MATERIALIZED (SELECT vec_id, "
            f"list_slice(v, {j * sub + 1}, {j * sub + sub}) AS v FROM e)"
        )
        ctes.append(
            f"env{j} AS MATERIALIZED (SELECT vec_id, v FROM e{j} "
            f"WHERE v IS NOT NULL)"
        )
        ctes.append(kmeans_chain(k, n_iter, sub, src=f"env{j}", prefix=f"s{j}"))
        ctes.append(f"""b{j} AS MATERIALIZED (
        SELECT vec_id, code{j}, d{j} FROM (
            SELECT e.vec_id, c.cluster_id AS code{j}, {d2} AS d{j},
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2} ASC, c.cluster_id ASC) AS rn
            FROM e{j} e CROSS JOIN s{j}c{n_iter} c) WHERE rn = 1)""")
    packed = "CAST(0 AS BIGINT)"
    for j in range(m):
        packed = f"({packed} * 16 + code{j})"
    err = " + ".join(f"d{j}" for j in range(m))
    joins = " ".join(f"JOIN b{j} USING (vec_id)" for j in range(1, m))
    return f"""
    WITH {",".join(ctes)}
    SELECT vec_id, {packed} AS packed_code, round(sqrt({err}), 6) AS recon_err
    FROM b0 {joins}
    """


@register("product_quantize_pq", oracle=_pq_oracle(m=8, k=16, n_iter=3, dim=64))
def product_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 8 subspaces × 16 subcentroids → 4-byte codes
    for 64-dim vectors (64× compression) with reconstruction error.
    Subspace codebooks train via kmeans_fit; encoding is ONE map-side
    projection over a broadcast nested codebook (llmops/cluster.py:
    product_quantize). Numpy-replica parity test.

    The registered form packs the m 4-bit codes big-endian into one BIGINT
    (``packed_code``) so every output column is a sortable scalar — the
    external comparator cannot canonicalize array columns. Library users
    get the array form from llmops.cluster.product_quantize directly.

    ORACLE-CHECKED since round 4: round_dp=6 pins every subspace
    codebook, so DuckDB replays all 8 independent kmeans fits and the
    encode — every packed code and reconstruction error hash-verified."""
    from ..llmops.cluster import product_quantize

    out = product_quantize(
        _t(spark, sf_dir, "embeddings"), m=8, k=16, n_iter=3, round_dp=6
    )
    packed = F.aggregate(
        F.col("codes"),
        F.lit(0).cast("long"),
        lambda acc, c: acc * 16 + c.cast("long"),
    )
    return out.select("vec_id", packed.alias("packed_code"), "recon_err")


def _kmeans_oracle(k: int = 8, n_iter: int = 4, dim: int = 64) -> str:
    """Lloyd's k-means unrolled to SQL (CTE chain shared via sqlfrags).
    Only checkable because kmeans_fit(round_dp=6) pins the model state
    after every round — each engine's order-dependent float mean rounds
    to the same 6-dp value, and the squared-L2 fold is the bit-exact
    list_dot_product ≡ zip_with/aggregate pairing."""
    from .sqlfrags import kmeans_assign, kmeans_ctes

    return f"""
    WITH {kmeans_ctes(k, n_iter, dim)},
    assign AS ({kmeans_assign(n_iter, dim)})
    SELECT vec_id, cluster_id, round(dist2, 6) AS dist2 FROM assign
    """


@register("kmeans_clusters", oracle=_kmeans_oracle(k=8, n_iter=4, dim=64))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unsupervised Lloyd's k-means (k=8, 4 iterations, deterministic
    lowest-id init) over the embedding corpus: (vec_id, cluster_id, dist2).
    Broadcast centroids, map-side assignment, one (cluster, dim) shuffle
    per round, bounded driver model state (llmops/cluster.py). Tests
    replay the algorithm in numpy and assert identical assignments.

    ORACLE-CHECKED since round 4: centroids are rounded to 6 dp after
    every Lloyd iteration (round_dp=6 — the ivf_centroid_assign recipe
    applied per-round), which pins the otherwise order-dependent float
    means so DuckDB's unrolled-CTE replay reproduces the exact
    assignments and distances."""
    from ..llmops.cluster import kmeans_clusters as km

    return km(_t(spark, sf_dir, "embeddings"), k=8, n_iter=4, round_dp=6)
