"""Round-12 pre-flight pack (NOT registered — one pack registers per
round, and round 10 registered llm72; this pack follows llm72's cadence:
built and gated one round ahead, registered at the round-11 close if the
rotation capacity holds, fronting the round-12 window).

The tranche continues the LLM-training-data surface with the curation
operators the llm72 pack didn't cover: Gopher-style repetition signals,
substring-dedup SCRUBBING (spans -> token removal accounting), source-
mix divergence, a hashed linear quality scorer (the fastText-class
model-scoring plumbing), packed-sequence attention-waste accounting,
tokenizer fertility, an isotonic (PAVA) calibration fit, and
deterministic span-corruption mask planning (T5-style denoising).

This module is deliberately NOT imported by ``queries/__init__.py``;
nothing here can reach the driver window or add stale-green debt.
``tests/test_r12_preflight.py`` runs every entry through the same
compare() harness the fixture gates use at sf0.001, a crafted boundary
fixture, AND sf0.1 (the rounding-tie tier), plus python-reference parity
for the rows-only entry.

Provenance: extends the reference's batch-processing surface
(blocknavi/convex-batch-processor, src/lib.ts — per-key aggregation and
retention state machines) with LLM-pipeline operators the task brief
names as first-class; none have a reference counterpart.

Determinism: the established recipes — exact integer counts until one
raw double division (rule 14: never round an exact ratio), leaf-rounded
transcendentals at 9 dp, division-free guard conditions, md5-derived
integers for portable pseudo-randomness (rule 15: decimal scales narrow
only via explicit round()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..llmops.dedup import tokens_col


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# name -> (fn, oracle_sql) — the shape register() consumes at
# registration time (the llm72 mechanism).
CANDIDATES: dict[str, tuple] = {}


def _candidate(name: str, oracle: str | None = None):
    def deco(fn):
        CANDIDATES[name] = (fn, oracle)
        return fn

    return deco


# --- 1. Gopher repetition signals: top n-gram character coverage -------------

_REP_NS = (2, 3, 4)


@_candidate(
    "top_ngram_char_fraction",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
    base AS (
        SELECT doc_id, t, CAST(len(array_to_string(t, ' ')) AS BIGINT)
                   AS total_chars
        FROM toks),
    g AS (
        SELECT doc_id, total_chars, n.n AS n,
               array_to_string(t[i:i + n.n - 1], ' ') AS gram
        FROM base
        CROSS JOIN (SELECT unnest({list(_REP_NS)}) AS n) n
        , unnest(range(1, len(t) - n.n + 2)) AS r(i)
        WHERE len(t) >= n.n),
    per_gram AS (
        SELECT doc_id, n, total_chars,
               CAST(COUNT(*) AS BIGINT) * CAST(len(gram) AS BIGINT) AS cover
        FROM g GROUP BY doc_id, n, total_chars, gram)
    SELECT doc_id, CAST(n AS INTEGER) AS n,
           CAST(MAX(cover) AS BIGINT) AS top_cover_chars,
           total_chars,
           CAST(MAX(cover) AS BIGINT) / CAST(total_chars AS DOUBLE)
               AS cover_frac
    FROM per_gram GROUP BY doc_id, n, total_chars
    """,
)
def top_ngram_char_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: per (document, n) for n in (2,3,4),
    the character-coverage of the heaviest n-gram — MAX over grams of
    occurrence_count x gram_char_length, as a fraction of the doc's
    normalized text length (tokens joined by single spaces). High values
    flag boilerplate/repetitive docs the quality filter should drop
    (Rae et al., Gopher, repetition heuristics). The MAX formulation is
    tie-free by construction: equal-coverage grams yield the same value,
    so no "which gram" tiebreak exists to diverge on.

    Determinism: coverage is an exact integer product; the only float op
    is the final raw division (rule 14: emitted UNROUNDED). cover_frac
    can exceed 1.0 for n >= 2 (occurrences overlap-count positions) —
    that is the standard formulation; the filter thresholds are
    calibrated to it.

    Scale: one positional gram explode per n (map-side, |_REP_NS| = 3
    passes over token arrays) -> ONE (doc, n, gram)-keyed shuffle ->
    one (doc, n) reduce. Candidate volume is 3 x sum-of-positions,
    never doc x doc; gram keys are near-uniform."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = docs.select(
        "doc_id",
        tokens_col("text").alias("t"),
    ).select(
        "doc_id", "t",
        F.length(F.array_join("t", " ")).cast("long").alias("total_chars"),
    )
    def grams_of(n: int):
        # a plain 1-ary lambda on purpose: F.transform dispatches on the
        # lambda's ARITY — a binary lambda (the `_n=n` default-arg trick)
        # silently receives (element, array_index) and the index
        # OVERWRITES the bound width (the phrase_tag_spans footgun)
        return F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("t", i, n)),
        )

    streams = []
    for n in _REP_NS:
        grams = grams_of(n)
        streams.append(
            base.filter(F.size("t") >= n).select(
                "doc_id",
                "total_chars",
                F.lit(n).alias("n"),
                F.explode(grams).alias("gram"),
            )
        )
    g = streams[0]
    for s in streams[1:]:
        g = g.unionAll(s)
    per_gram = g.groupBy("doc_id", "n", "total_chars", "gram").agg(
        (F.count(F.lit(1)) * F.length("gram").cast("long")).alias("cover")
    )
    return per_gram.groupBy("doc_id", "n", "total_chars").agg(
        F.max("cover").alias("top_cover_chars"),
    ).select(
        "doc_id",
        F.col("n").cast("int").alias("n"),
        "top_cover_chars",
        "total_chars",
        (F.col("top_cover_chars") / F.col("total_chars").cast("double"))
        .alias("cover_frac"),
    )


# --- 2. substring-dedup scrub accounting --------------------------------------

_SCRUB_N = 8  # gram width: a duplicated gram marks its 8 covered tokens


@_candidate(
    "substring_dedup_scrub",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL),
    sized AS (
        SELECT doc_id, t, CAST(len(t) AS BIGINT) AS n_tokens FROM toks),
    g AS (
        SELECT doc_id, i AS pos, array_to_string(t[i:i + {_SCRUB_N - 1}], ' ') AS gram
        FROM sized, unnest(range(1, len(t) - {_SCRUB_N - 2})) AS r(i)
        WHERE len(t) >= {_SCRUB_N}),
    nd AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
    covered AS (
        SELECT DISTINCT g.doc_id, c.tok_idx
        FROM g JOIN nd USING (gram)
        , unnest(range(g.pos, g.pos + {_SCRUB_N})) AS c(tok_idx)),
    removed AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed
        FROM covered GROUP BY doc_id)
    SELECT s.doc_id, s.n_tokens,
           COALESCE(r.n_removed, 0) AS n_removed_tokens,
           s.n_tokens - COALESCE(r.n_removed, 0) AS n_kept_tokens
    FROM sized s LEFT JOIN removed r ON r.doc_id = s.doc_id
    """,
)
def substring_dedup_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup REMOVAL accounting — the action step after
    substring_dedup_spans (llm72): a token is removed iff ANY cross-doc
    duplicated 8-gram (_SCRUB_N) covers it (the Lee et al. substring-
    removal policy with the duplication threshold = the gram width).
    Emits per-doc kept/removed token counts for every tokenizable doc
    (zero-duplication docs emit n_removed = 0) — the budget a training
    pipeline reclaims by scrubbing.

    Correctness subtlety the spans query cannot see: adjacent duplicated
    runs closer than the gram width cover OVERLAPPING token ranges, so
    removal counts DISTINCT covered token indices (an 8x bounded explode
    of duplicated positions), never a sum of per-run span lengths.

    Determinism: exact integers end to end — no float anywhere.

    Scale: the same gram-keyed shuffle as the spans query; the coverage
    explode is 8x the DUPLICATED-position count only (duplication-bounded,
    not corpus-bounded), then one doc-keyed distinct+reduce. The final
    join back to per-doc sizes is doc-keyed."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = docs.select("doc_id", tokens_col("text").alias("t")).select(
        "doc_id", "t", F.size("t").cast("long").alias("n_tokens")
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - (_SCRUB_N - 1)),
        lambda i: F.concat_ws(" ", F.slice("t", i, _SCRUB_N)),
    )
    # Deliberate session-lifetime cache: g feeds the document-frequency
    # aggregate AND the join-back (ADVICE r9 / the llm72 recipe)
    g = sized.filter(F.size("t") >= _SCRUB_N).select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).persist()
    nd = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    covered = (
        g.join(nd, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(_SCRUB_N - 1))
            ).alias("tok_idx"),
        )
        .distinct()
    )
    removed = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_removed")
    )
    return (
        sized.select("doc_id", "n_tokens")
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_removed"), F.lit(0)).alias("n_removed_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("n_removed"), F.lit(0)))
            .alias("n_kept_tokens"),
        )
    )


# --- 3. source-mix divergence from uniform -------------------------------------


@_candidate(
    "source_mix_divergence",
    oracle="""
    WITH c AS (
        SELECT source,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL GROUP BY source),
    t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS k FROM c)
    SELECT source, n_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           round(ln((CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                    * CAST(k AS DOUBLE)), 9) AS ln_ratio_uniform,
           round((CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                 * round(ln((CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE))
                            * CAST(k AS DOUBLE)), 9), 9) AS kl_term
    FROM c CROSS JOIN t
    """,
)
def source_mix_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix KL decomposition vs the uniform mix: per source its
    token share p_i, ln(p_i / (1/k)) and the KL contribution
    p_i ln(p_i k) — the mixing diagnostic that says which sources a
    rebalancing (temperature_mix_weights, llm72) would move most.
    Sources with tokens have p_i > 0, so the log argument is positive by
    construction; summing kl_term over the rows gives KL(p || uniform).

    Determinism: shares are raw exact-integer ratios (rule 14 —
    unrounded); ln is a leaf-rounded transcendental at 9 dp; kl_term
    re-rounds the product at 9 dp (its bits contain the ln's, so a tie
    is measure-zero, the transcendental-leaf class).

    Scale: one |sources|-keyed shuffle; the total joins back as a
    one-row broadcast; token counting is map-side size(split())."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    c = docs.groupBy("source").agg(
        F.sum(F.size(tokens_col("text"))).cast("long").alias("n_tokens")
    )
    t = F.broadcast(
        c.agg(
            F.sum("n_tokens").cast("long").alias("tot"),
            F.count(F.lit(1)).cast("long").alias("k"),
        )
    )
    share = F.col("n_tokens").cast("double") / F.col("tot").cast("double")
    ln9 = F.round(F.log(share * F.col("k").cast("double")), 9)
    return c.crossJoin(t).select(
        "source",
        "n_tokens",
        share.alias("share"),
        ln9.alias("ln_ratio_uniform"),
        F.round(share * ln9, 9).alias("kl_term"),
    )


# --- 4. hashed linear quality scorer (fastText-class plumbing) -----------------

# md5-derived integer weights in [-1e6, 1e6] (scale 1e-6): exact BIGINT
# arithmetic end to end; the weight table IS the hash, so the "model"
# is deterministic, portable, and needs no sidecar state.
_W_MOD = 2000001
_W_OFF = 1000000
_TWO60 = float(1 << 60)


@_candidate(
    "hashed_linear_quality_score",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                          x -> x <> '')) AS tok
        FROM documents WHERE text IS NOT NULL),
    w AS (
        SELECT doc_id,
               (CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % {_W_MOD})
                   - {_W_OFF} AS wi
        FROM tok),
    s AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(wi) AS BIGINT) AS w_sum
        FROM w GROUP BY doc_id)
    SELECT doc_id, n_tokens, w_sum,
           CAST(w_sum AS DOUBLE) / (CAST(n_tokens AS DOUBLE) * 1e6)
               AS mean_w,
           round(1.0 / (1.0 + exp(-(CAST(w_sum AS DOUBLE)
                 / (CAST(n_tokens AS DOUBLE) * 1e6)))), 9) AS quality_p
    FROM s
    """,
)
def hashed_linear_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality scorer — the fastText-class scoring
    PLUMBING (feature hashing -> per-token weight lookup -> mean ->
    sigmoid) with a deterministic md5-derived weight table standing in
    for trained weights (weight(token) = md5_60bits % 2000001 - 1e6,
    i.e. an integer in [-1e6, 1e6] read at scale 1e-6). Swapping the
    hash-weight expression for a broadcast-joined learned table is the
    production path; every other part of the pipeline is exactly this.

    Determinism: the weight is an exact BIGINT (both engines compute the
    same 60-bit md5 prefix and the same %), the per-doc sum is an exact
    BIGINT, the mean is one raw double division of exact integers
    (rule 14 — unrounded), and only the sigmoid leaf rounds at 9 dp
    (transcendental).

    Scale: token explode (map-side) -> one doc-keyed reduce; the weight
    is a pure column expression, so there is NO model state to ship —
    the 100 TB plan is a single map + reduce."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = docs.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    wi = (
        F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 15), 16, 10)
        .cast("long") % F.lit(_W_MOD)
        - F.lit(_W_OFF)
    )
    s = tok.select("doc_id", wi.alias("wi")).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("wi").cast("long").alias("w_sum"),
    )
    mean_w = F.col("w_sum").cast("double") / (
        F.col("n_tokens").cast("double") * F.lit(1e6)
    )
    return s.select(
        "doc_id",
        "n_tokens",
        "w_sum",
        mean_w.alias("mean_w"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-mean_w)), 9)
        .alias("quality_p"),
    )


# --- 5. packed-sequence attention-waste accounting ----------------------------

_CHUNK_CAP = 512


@_candidate(
    "chunked_attention_waste",
    oracle=f"""
    WITH sized AS (
        SELECT source, doc_id,
               COALESCE(len(list_filter(string_split(text, ' '), x -> x <> '')), 0)
                   AS n_tokens
        FROM documents),
    binned AS (
        SELECT source, n_tokens,
               CAST(floor((CAST(SUM(n_tokens) OVER (
                               PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens)
                          / {float(_CHUNK_CAP)}) AS BIGINT) AS bin_id
        FROM sized),
    agg AS (
        SELECT source, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_real,
               CAST(SUM(CAST(n_tokens AS BIGINT) * CAST(n_tokens AS BIGINT))
                    AS BIGINT) AS n_sq
        FROM binned GROUP BY source, bin_id)
    SELECT source, bin_id, n_docs, n_real,
           CASE WHEN n_real > 0
                THEN CAST(n_real * n_real - n_sq AS DOUBLE)
                     / CAST(n_real * n_real AS DOUBLE)
                ELSE NULL END AS cross_attn_frac
    FROM agg
    """,
)
def chunked_attention_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence attention-waste accounting over the streaming-chunk
    packing (token_pack_chunks' bins: per source in doc order, bin =
    exclusive token cumsum div 512): per (source, bin) the fraction of
    dense-attention token pairs that CROSS document boundaries —
    (n_real^2 - sum n_i^2) / n_real^2 — the quantity a block-diagonal
    attention mask (or better packing) reclaims. The sum-of-squares
    identity needs no pair expansion.

    Determinism: exact integers until one raw double division (rule 14 —
    unrounded); an all-empty-doc bin (n_real = 0) yields NULL through a
    DIVISION-FREE guard condition on both engines (the round-7 rule: the
    guard must not itself divide).

    Scale: one window cumsum per source (the packing recipe), one
    (source, bin) reduce — no Python, no pair explosion; n^2 peaks at
    (per-doc token count)^2 inside a BIGINT."""
    docs = _t(spark, sf_dir, "documents")
    sized = docs.select(
        "source",
        "doc_id",
        F.coalesce(F.size(tokens_col("text")), F.lit(0)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = sized.select(
        "source",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w).cast("long") - F.col("n_tokens"))
            / F.lit(float(_CHUNK_CAP))
        ).cast("long").alias("bin_id"),
    )
    agg = binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_real"),
        F.sum(
            F.col("n_tokens").cast("long") * F.col("n_tokens").cast("long")
        ).cast("long").alias("n_sq"),
    )
    sq = F.col("n_real") * F.col("n_real")
    return agg.select(
        "source",
        "bin_id",
        "n_docs",
        "n_real",
        F.when(
            F.col("n_real") > 0,
            (sq - F.col("n_sq")).cast("double") / sq.cast("double"),
        ).otherwise(F.lit(None).cast("double")).alias("cross_attn_frac"),
    )


# --- 6. tokenizer fertility by language ----------------------------------------


@_candidate(
    "tokenizer_fertility_by_lang",
    oracle="""
    WITH d AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens,
               CAST(len(array_to_string(
                        list_filter(string_split(text, ' '), x -> x <> ''), ' '))
                    AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL),
    g AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM d GROUP BY lang)
    SELECT lang, n_docs, n_tokens, n_chars,
           CASE WHEN n_tokens > 0
                THEN CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                ELSE NULL END AS chars_per_token,
           CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
               AS tokens_per_doc
    FROM g
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility profile by language: docs, whitespace tokens,
    normalized characters (tokens re-joined by single spaces, so
    irregular whitespace never skews the ratio), chars-per-token and
    tokens-per-doc — the per-language cost model a tokenizer/budget
    planner reads before allocating a multilingual mix (fertility
    differences of 2-4x between scripts are the classic surprise).
    NULL-lang docs form their own group on both engines (GROUP BY,
    not a window — no NULL-ordering hazard).

    Determinism: exact integer aggregates; the two ratios are raw
    double divisions (rule 14 — unrounded); the all-empty-text group
    (n_tokens = 0) NULL-guards its ratio with a division-free condition;
    n_docs >= 1 by construction.

    Scale: map-side size/length -> one |langs|-keyed reduce."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    d = docs.select(
        "lang",
        F.size(tokens_col("text")).cast("long").alias("n_tokens"),
        F.length(F.array_join(tokens_col("text"), " "))
        .cast("long")
        .alias("n_chars"),
    )
    g = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.when(
            F.col("n_tokens") > 0,
            F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"),
        ).otherwise(F.lit(None).cast("double")).alias("chars_per_token"),
        (F.col("n_tokens").cast("double") / F.col("n_docs").cast("double"))
        .alias("tokens_per_doc"),
    )


# --- 7. isotonic (PAVA) calibration fit (rows-only) ----------------------------


@_candidate("isotonic_calibration_pava", oracle=None)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (pool-adjacent-violators) of the return rate
    against quantity — the nonparametric calibration fit that upgrades
    the binned calibration table (calibration_bins, llm44): fit the
    best monotone non-decreasing rate r(v) minimizing weighted squared
    error over the per-quantity histogram (v, c, p), weights c.

    Rows-only by documented contract: PAVA's pooling is an inherently
    sequential scan, not one SQL query — tests/test_r12_preflight.py
    pins exact parity against a pure-Python PAVA plus the invariants
    (non-decreasing fit, weighted mean preserved, fit constant within
    pools). The sequential step runs over the COLLAPSED per-quantity
    histogram (|distinct quantities| rows — the bounded-histogram class
    every calibration query in the repo uses), via applyInPandas on a
    single constant group: the corpus-scale work (the histogram) is
    distributed; only the |values|-sized table is sequential.

    Determinism: pool means are computed from exact integer (sum_p,
    sum_c) pairs carried through the pooling loop; the emitted rate is
    one raw double division per pool (rule 14 — unrounded)."""
    li = _t(spark, sf_dir, "lineitem")
    hist = li.groupBy(F.col("l_quantity").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum((F.col("l_returnflag") == "R").cast("long"))
        .cast("long")
        .alias("p"),
    )

    def pava(pdf):
        import pandas as pd

        pdf = pdf.sort_values("v").reset_index(drop=True)
        # each pool: [v_start, v_end, sum_p, sum_c] with exact ints
        pools: list = []
        for row in pdf.itertuples(index=False):
            pools.append([row.v, row.v, int(row.p), int(row.c)])
            # merge while the monotonicity p/c is violated (exact
            # integer cross-multiplication — no float compare)
            while (
                len(pools) >= 2
                and pools[-2][2] * pools[-1][3] > pools[-1][2] * pools[-2][3]
            ):
                a = pools.pop()
                pools[-1][1] = a[1]
                pools[-1][2] += a[2]
                pools[-1][3] += a[3]
        out = {"v": [], "c": [], "p": [], "rate_fit": []}
        for vs, ve, sp, sc in pools:
            fit = sp / sc
            sub = pdf[(pdf.v >= vs) & (pdf.v <= ve)]
            for r in sub.itertuples(index=False):
                out["v"].append(r.v)
                out["c"].append(int(r.c))
                out["p"].append(int(r.p))
                out["rate_fit"].append(fit)
        return pd.DataFrame(out)

    schema = "v double, c long, p long, rate_fit double"
    return (
        hist.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(pava, schema=schema)
    )


# --- 8. span-corruption mask planning (T5-style denoising) ---------------------

_MASK_PCT = 15   # target masked-token percentage
_SPAN_LEN = 3    # mean/target span length (tokens)


@_candidate(
    "span_corruption_plan",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tokens
        FROM documents WHERE text IS NOT NULL),
    planned AS (
        SELECT doc_id, n_tokens,
               (n_tokens * {_MASK_PCT}) // 100 AS n_target,
               ((n_tokens * {_MASK_PCT}) // 100 + {_SPAN_LEN - 1})
                   // {_SPAN_LEN} AS n_spans
        FROM sized
        WHERE (n_tokens * {_MASK_PCT}) // 100 >= 1),
    spans AS (
        SELECT doc_id, n_tokens, n_spans,
               CAST(i AS BIGINT) AS span_idx,
               n_tokens // n_spans AS stratum_len
        FROM planned, unnest(range(0, n_spans)) AS r(i)),
    placed AS (
        SELECT doc_id, n_tokens, span_idx,
               least({_SPAN_LEN}, stratum_len) AS span_len,
               span_idx * stratum_len + 1
                 + (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                            || CAST(span_idx AS VARCHAR)),
                                        1, 15) AS BIGINT)
                    % (stratum_len - least({_SPAN_LEN}, stratum_len) + 1))
                   AS start_pos
        FROM spans)
    SELECT doc_id, n_tokens, span_idx,
           CAST(start_pos AS BIGINT) AS start_pos,
           CAST(span_len AS BIGINT) AS span_len
    FROM placed
    """,
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption mask plan (the T5/UL2 denoising
    pre-processing step): per document, target 15% (_MASK_PCT) of tokens
    masked in spans of 3 (_SPAN_LEN) — n_spans = ceil(floor(0.15 n)/3)
    strata of equal length, one span per stratum at an md5-derived
    offset, so spans NEVER overlap by construction and the plan is
    reproducible across engines, retries, and partitions (rand() is
    none of those). Docs too short to mask a single token (n < 7) emit
    no rows. start_pos is a 1-based token index; a stratum shorter than
    the span length truncates its span.

    Determinism: exact integer arithmetic end to end — sizes, strata,
    and offsets (60-bit md5 prefix mod available positions); no floats
    anywhere.

    Scale: map-side size + a bounded explode (one row per planned span,
    ~n_tokens/20 per doc) — no shuffle at all until a consumer
    aggregates; the hash placement is a pure column expression."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    sized = docs.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    planned = (
        sized.withColumn(
            "n_target",
            ((F.col("n_tokens") * _MASK_PCT) / F.lit(100)).cast("long"),
        )
        .filter(F.col("n_target") >= 1)
        .withColumn(
            "n_spans",
            ((F.col("n_target") + F.lit(_SPAN_LEN - 1)) / F.lit(_SPAN_LEN))
            .cast("long"),
        )
    )
    spans = planned.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.explode(F.sequence(F.lit(0), F.col("n_spans") - 1)).alias("_i"),
    ).select(
        "doc_id",
        "n_tokens",
        F.col("_i").cast("long").alias("span_idx"),
        (F.col("n_tokens") / F.col("n_spans")).cast("long").alias("stratum_len"),
    )
    span_len = F.least(F.lit(_SPAN_LEN), F.col("stratum_len"))
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("span_idx").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    start = (
        F.col("span_idx") * F.col("stratum_len")
        + F.lit(1)
        + (h % (F.col("stratum_len") - span_len + 1))
    )
    return spans.select(
        "doc_id",
        "n_tokens",
        "span_idx",
        start.cast("long").alias("start_pos"),
        span_len.cast("long").alias("span_len"),
    )
