"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Everything is built-in Column expressions — at 100 TB these are one-pass
map-side computations with no shuffle at all (per-doc stats) or a single
aggregation shuffle (corpus stats); never Python-per-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def token_count(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text_col))


def token_count_re(text_col: str = "text") -> Column:
    """BPE-ish token count: alnum runs + single non-space symbols (JVM regexp).

    Whitespace is an EXPLICIT class, not ``\\s``: Java's ``\\s`` includes
    vertical tab (\\x0B) but RE2's (the DuckDB oracle side) does not — an
    ASCII \\x0B byte would token-count differently per engine (r8 review)."""
    return F.size(
        F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+|[^a-z0-9 \t\n\x0b\f\r]"), 0)
    )


def stopword_ratio(text_col: str = "text") -> Column:
    """Fraction of tokens that are stopwords (lambda filter, codegen'd)."""
    toks = tokens_col(text_col)

    def is_stop(x: Column) -> Column:
        c = x == F.lit(STOPWORDS[0])
        for s in STOPWORDS[1:]:
            c = c | (x == F.lit(s))
        return c

    # NULL (not a crash) on token-less docs: ANSI Spark throws on x/0 —
    # a 100 TB crawl always contains empty documents
    return F.when(
        F.size(toks) > 0, F.size(F.filter(toks, is_stop)).cast("double") / F.size(toks)
    )


def quality_label(text_col: str = "text", min_tokens: int = 20, max_tokens: int = 1000) -> Column:
    """Heuristic quality gate: token-count band + stopword-ratio ceiling —
    the shape of a Gopher/C4-style rule on the columns the testdata has."""
    nt = token_count(text_col)
    return F.when(
        (nt >= min_tokens) & (nt <= max_tokens) & (stopword_ratio(text_col) < 0.5), "ok"
    ).otherwise("low")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_words: int = 100_000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 10.0,
    min_distinct_frac: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition/shape quality rules, one map-side pass:
    (id, n_words, mean_word_len, distinct_frac, has_stopword, keep).

    The four Gopher rule families expressible on this corpus: document
    length band, mean-word-length band (garbage/boilerplate detector),
    duplicate-token fraction (1 − distinct/total — the repetition rule),
    and stopword presence (natural-language-ness). All arithmetic is
    int-count ratios in float64 — bit-stable across engines with no
    rounding needed. Empty-token docs are excluded (nothing to judge,
    and 0-denominators diverge between engines).
    """
    d = df.select(F.col(id_col), tokens_col(text_col).alias("toks")).filter(
        F.size("toks") > 0
    )
    n = F.size("toks")
    mean_len = (
        F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n
    )
    distinct_frac = F.size(F.array_distinct("toks")).cast("double") / n
    has_stop = F.arrays_overlap(
        "toks", F.array(*[F.lit(s) for s in STOPWORDS])
    )
    out = d.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_len.alias("mean_word_len"),
        distinct_frac.alias("distinct_frac"),
        has_stop.alias("has_stopword"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len)
        & (F.col("distinct_frac") >= min_distinct_frac)
        & F.col("has_stopword")
    )
    return out.withColumn("keep", keep)


def prefix_fingerprint(text_col: str = "text", n_tokens: int = 8) -> Column:
    """Deterministic document fingerprint: md5 of the first-n-token prefix
    (cheap rolling-hash stand-in, portable to the SQL oracle)."""
    return F.md5(F.concat_ws(" ", F.slice(tokens_col(text_col), 1, n_tokens)))


def char_trigrams(text_col: str = "text") -> Column:
    """Distinct character trigrams (language-ID features); texts shorter
    than 3 chars yield an EMPTY array (sequence(1,0) is descending and
    substr would fabricate partial grams otherwise)."""
    t = F.col(text_col)
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.length(t) - 2), lambda i: t.substr(i, F.lit(3)))
    )
    return F.when(F.length(t) >= 3, grams).otherwise(F.array().cast("array<string>"))


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", lang_col: str = "lang"
) -> DataFrame:
    """N-gram-overlap language ID, fully distributed.

    Build per-language char-trigram document-frequency profiles from the
    corpus (top-200 trigrams per language), then classify each doc to the
    language whose profile it overlaps most.

    Shuffle profile: explode trigrams (map-side) → groupBy(lang, trigram)
    (one shuffle) → broadcast the small profile table back; per-doc argmax is
    a window over the doc's ≤|langs| overlap rows. No O(n²) anywhere.
    """
    # persisted: doc_tri feeds BOTH the profile aggregation and the
    # overlaps join — unpersisted, the corpus-wide trigram explode runs
    # twice (the dup_span_coverage multi-consumer class). Deliberately
    # never unpersisted: the plan is returned lazily, so the last
    # consuming action — and hence the only correct unpersist point —
    # is the caller's; the cache is session-lifetime and LRU-evictable
    # under Spark's unified memory manager (ADVICE r8).
    doc_tri = df.select(
        F.col(id_col), F.col(lang_col), F.explode(char_trigrams(text_col)).alias("tg")
    ).persist()
    w_prof = Window.partitionBy(lang_col).orderBy(F.col("df").desc(), F.col("tg"))
    profiles = (
        doc_tri.groupBy(lang_col, "tg")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("rk", F.row_number().over(w_prof))
        .filter(F.col("rk") <= 200)
        .select(F.col(lang_col).alias("predicted_lang"), "tg")
    )
    overlaps = (
        doc_tri.join(F.broadcast(profiles), "tg")
        .groupBy(id_col, lang_col, "predicted_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w_doc = Window.partitionBy(id_col).orderBy(F.col("overlap").desc(), F.col("predicted_lang"))
    return (
        overlaps.withColumn("rn", F.row_number().over(w_doc))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col(lang_col).alias("actual_lang"),
            "predicted_lang",
            "overlap",
        )
    )
