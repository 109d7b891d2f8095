"""Text-retrieval operators: inverted-index term stats, BM25 scoring, and
eval-set n-gram decontamination.

Training-data pipelines use these for quality filtering (BM25 against
seed/reference queries, as in CCNet-style importance filtering) and for
benchmark decontamination (drop training docs sharing long n-grams with an
evaluation set). No reference counterpart — north-star additions per
SURVEY.md §2.11; the reference's only text handling is batchId string
parsing (lib.ts:40-42).

Scale notes (100 TB):
- Everything is inverted-index shaped: explode tokens/n-grams (map-side),
  one aggregation shuffle on the term key, then a broadcast join of the
  tiny term-statistics table back to the postings. No all-pairs joins.
- BM25 term posting lists are skew-prone for stopword-like terms; the
  query-term list is small and user-chosen, so the explode FILTERS to the
  query terms first — the shuffle carries only matching postings.
- Determinism for the DuckDB oracle: idf is rounded to 9 dp before use
  (C libm vs JVM Math.log can differ in the last ulp), per-term
  contributions are combined with a FIXED left-to-right addition (one
  pivoted column per query term — no order-dependent float sum), and the
  final score is rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exploded_shingles, tokens_col


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score for a bag-of-words query.

    (doc_id, score): Lucene-style BM25 with
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation k1 and length
    normalization b. Scoring plan: explode→filter to query terms → tf per
    (doc, term) [one shuffle] → df per term (tiny, broadcast back) → one
    pivoted aggregation per doc. Corpus stats (N, avgdl) ride along as a
    broadcast single-row cross join.
    """
    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("t"))
    dl = toks.select(id_col, F.size("t").alias("dl"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.size("t")).cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.select(F.col(id_col), F.explode("t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.round(
            F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 9
        ).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("term"),
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    # one pivoted MAX per query term: at most one contribution per (doc, term),
    # so no order-dependent float summation ever happens; the final addition is
    # a fixed left-to-right expression, bit-identical across engines.
    pivoted = contrib.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("c"))).alias(f"c_{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.lit(0.0)
    for i in range(len(terms)):
        total = total + F.coalesce(F.col(f"c_{i}"), F.lit(0.0))
    return (
        pivoted.select(F.col(id_col), F.round(total, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def ngram_contamination(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: training docs sharing at least one token
    n-gram with any eval doc.

    (doc_id, n_eval_docs, n_shared_grams) per contaminated training doc.
    Plan: distinct n-grams per side (map-side explode), equi-join on the
    gram [one shuffle on gram — the scale-safe blocking key], then one
    aggregation per training doc. Long grams (n=8 default) keep the join
    selective; no pairwise doc×doc comparison exists anywhere.
    """
    def grams(df: DataFrame, out: str) -> DataFrame:
        # exploded_shingles, NOT an inline tokens_col() expression:
        # shingles_from_tokens over an unmaterialized split re-executes
        # the split per gram slot — O(tokens^2) per doc, measured 6.5x
        # (dedup.py's documented perf contract)
        return exploded_shingles(df, text_col, id_col, n, out="gram").withColumnRenamed(
            id_col, out
        )

    return (
        grams(train, "doc_id")
        .join(grams(evalset, "eval_doc_id"), "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("eval_doc_id").alias("n_eval_docs"),
            F.countDistinct("gram").alias("n_shared_grams"),
        )
    )


def bigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Language-model quality scoring: per-doc average bigram log-prob
    under a Laplace-smoothed bigram model trained on the corpus itself —
    the shape of a CCNet/KenLM-style perplexity filter with the engine's
    own corpus standing in for the reference LM.

    (doc_id, n_bigrams, avg_logp): p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V);
    avg_logp = mean ln p over the doc's bigrams (higher = more typical
    text; rank ascending to find junk). Docs with <2 tokens are excluded
    (no bigrams).

    Plan shape at scale: one explode of per-position bigrams (map-side),
    two count shuffles on the bigram/prefix keys (inverted-index shaped,
    vocabulary-bounded), the count tables join back on those same keys,
    and the per-doc reduce is one aggregation. Nothing is ever pairwise
    in the corpus size.

    Cross-engine determinism: each ln is rounded to 9 dp and accumulated
    as DECIMAL(18,9) — an exact, order-independent sum (summing raw
    doubles would drift between Spark's partial aggregation and the
    oracle's single-threaded sum); the final average divides the exact
    sum by the count in double.
    """
    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("t"))
    big = toks.filter(F.size("t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))
    # persisted: big feeds the bigram counts, the prefix counts AND the
    # scoring join-back — unpersisted, the corpus bigram explode executes
    # THREE times per action (the ngram_novelty grams class). Deliberate
    # session-lifetime cache: the plan is returned lazily, so the
    # unpersist point is the caller's last action; LRU-evictable (ADVICE r8)
    big = big.persist()

    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    c1 = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.explode("t").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        big.join(c12, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.round(
                F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))), 9
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(F.col("lp").cast("decimal(18,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_logp"),
    )


def trigram_logprob_scores(
    docs: DataFrame,
    lambdas: tuple[float, float, float] = (0.5, 0.3, 0.2),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated trigram LM quality scoring — the backoff-style upgrade
    of ``bigram_logprob_scores``: p = λ3·p3 + λ2·p2 + λ1·p1 with Laplace
    smoothing at each order, averaged as ln p per trigram position.

    (doc_id, n_trigrams, avg_logp). Docs with <3 tokens are excluded.
    Interpolation weights are applied in a FIXED expression order and the
    per-position ln is rounded then decimal-accumulated, so the result is
    bit-identical across engines (same discipline as the bigram scorer).

    Plan shape: three map-side explodes (uni/bi/tri positions), three
    vocabulary-bounded count shuffles, then the trigram-position table
    joins the count tables on their own keys and reduces per doc. Count
    tables are corpus-vocabulary sized, never corpus sized.
    """
    l3, l2, l1 = lambdas
    toks = docs.select(F.col(id_col), tokens_col(text_col).alias("t"))

    def positions(n: int):
        """(doc_id, w1..wn) for every length-n window, via zipped slices."""
        cols = [
            F.slice(F.col("t"), i + 1, F.size("t") - (n - 1)) for i in range(n)
        ]
        if n == 1:
            arr = F.col("t")
            return toks.select(
                F.col(id_col), F.explode(arr).alias("w1")
            )
        zipped = F.arrays_zip(*cols)
        out = toks.filter(F.size("t") >= n).select(
            F.col(id_col), F.explode(zipped).alias("z")
        )
        return out.select(
            F.col(id_col), *[F.col(f"z.{i}").alias(f"w{i+1}") for i in range(n)]
        )

    # uni feeds its count table AND the corpus stats; tri feeds its count
    # table AND the scoring join-back — persist both or the explodes run
    # twice per action (same class as the bigram scorer's `big` persist)
    uni = positions(1).persist()
    bi = positions(2)
    tri = positions(3).persist()

    u = uni.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    b = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    t3 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("ct"))
    stats = uni.agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("w1").alias("v"),
    )

    pos = (
        tri.join(t3, ["w1", "w2", "w3"])
        .join(b.select(F.col("w1"), F.col("w2"), F.col("cb").alias("cb12")), ["w1", "w2"])
        .join(
            b.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3"),
                F.col("cb").alias("cb23"),
            ),
            ["w2", "w3"],
        )
        .join(u.select(F.col("w1").alias("w2"), F.col("cu").alias("cu2")), ["w2"])
        .join(u.select(F.col("w1").alias("w3"), F.col("cu").alias("cu3")), ["w3"])
        .crossJoin(F.broadcast(stats))
    )
    p3 = (F.col("ct") + 1.0) / (F.col("cb12") + F.col("v"))
    p2 = (F.col("cb23") + 1.0) / (F.col("cu2") + F.col("v"))
    p1 = (F.col("cu3") + 1.0) / (F.col("n_tok") + F.col("v"))
    lp = F.round(F.log(F.lit(l3) * p3 + F.lit(l2) * p2 + F.lit(l1) * p1), 9)
    return (
        pos.select(F.col(id_col), lp.alias("lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            (
                F.sum(F.col("lp").cast("decimal(18,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_logp"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.04,
    df_cap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
) -> DataFrame:
    """Sparse TF-IDF cosine similarity join over word 3-gram vectors —
    the weighted complement of the unweighted Jaccard join
    (dedup.ngram_jaccard-style): rare shared phrasing counts more than
    boilerplate, the classic fix for boilerplate-dominated near-dup
    scoring.

    Vector space: grams with document frequency <= ``df_cap`` (DISCO-style
    stop-term pruning — hyper-common grams carry ~zero IDF anyway and are
    what makes an inverted-index join quadratic). Within that space the
    cosine is EXACT: weights are integer nano-units ``tf *
    round(ln((N+1)/(df+1)), 9)*1e9`` so dots and norms accumulate in
    decimal with no float-order drift, and df=1 grams are skipped in pair
    generation (they cannot produce a cross term) while still counting
    toward norms — lossless.

    Scale shape: one explode -> one (block, gram) inverted-index equi-join
    -> one pair aggregation; candidates are blocked by ``block_col`` and
    capped by df_cap, so no term contributes more than df_cap^2/2 pairs.
    No cross join, no UDF, all decimal/JVM."""
    from .dedup import tokens_col

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("blk"),
        tokens_col(text_col).alias("_t"),
    )
    # sequence(1, 0) is DESCENDING [1, 0] (not empty) and slice(_, 0, 3)
    # crashes — short docs must yield an explicit empty index array (the
    # shingles_from_tokens contract in dedup.py)
    idx = F.when(
        F.size("_t") >= 3, F.sequence(F.lit(1), F.size("_t") - 2)
    ).otherwise(F.array().cast("array<int>"))
    gram = F.concat_ws(" ", F.slice(F.col("_t"), F.col("i"), 3))
    ex = toks.select(
        "doc_id", "blk", F.explode(idx).alias("i"), "_t"
    ).select("doc_id", "blk", gram.alias("g"))
    tf = ex.groupBy("doc_id", "blk", "g").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf_n9 = F.round(
        F.round(F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 9) * 1e9
    ).cast("long")
    w = (
        tf.join(dft, "g")
        .filter(F.col("df") <= df_cap)
        .crossJoin(F.broadcast(n))
        .select("doc_id", "blk", "g", "df", (F.col("tf") * idf_n9).alias("wn"))
        .persist()
    )
    wd = F.col("wn").cast("decimal(19,0)")
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(wd * wd).cast("double")).alias("nrm")
    )
    shared = w.filter(F.col("df") >= 2)
    a = shared.select(
        F.col("doc_id").alias("id_a"), "blk", "g", F.col("wn").alias("wa")
    )
    b = shared.select(
        F.col("doc_id").alias("id_b"), "blk", "g", F.col("wn").alias("wb")
    )
    dot = (
        a.join(b, ["blk", "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.col("wa").cast("decimal(19,0)") * F.col("wb").cast("decimal(19,0)"))
            .cast("double")
            .alias("dot")
        )
    )
    na = nrm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, F.round(F.col("dot") / den, 6))
    return (
        dot.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
