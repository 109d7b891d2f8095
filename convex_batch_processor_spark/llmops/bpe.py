"""BPE (byte-pair encoding) merge-rule training over a corpus — the
tokenizer-construction step of a training-data pipeline, DataFrame-native.

Classic BPE (Sennrich et al., 2016): represent each distinct word as a
symbol sequence (initially characters), repeatedly count adjacent symbol
pairs weighted by word frequency, merge the most frequent pair everywhere,
and record the merge rules in order. The rule list IS the tokenizer.

Spark shape (how production tokenizer trainers split the work — one
corpus-scale pass, then vocabulary-bounded state):
- the corpus is touched exactly ONCE, to build the distinct-word frequency
  table (one explode + one aggregation shuffle). Everything after operates
  on that table, which is orders of magnitude smaller than the corpus and
  prunable further with ``min_freq``.
- ``mode="local"`` (default when the vocabulary fits ``max_local_vocab``):
  collect the word table and run the EXACT classic merge loop driver-side
  with incrementally-maintained pair counts (lazy max-heap, inverted
  pair→word index) — O(total symbol updates · log pairs) for the whole
  rule sequence, zero Spark jobs per rule. A 32k-rule vocabulary trains in
  seconds instead of 32k sequential cluster jobs; this is the same
  corpus-pass + local-train split HuggingFace tokenizers / SentencePiece
  use, and the collected state is the bounded vocabulary, never the corpus.
- ``mode="distributed"``: the fallback when even the pruned vocabulary
  exceeds driver memory — per round, pair counting is one explode + one
  aggregation shuffle, the argmax a 1-row TakeOrdered, and the merge
  rewrite a JVM ``aggregate`` fold over each word's symbol array, with
  ``localCheckpoint`` so the plan does not grow with rounds. Correct at
  any scale but costs one Spark job per rule — prune with ``min_freq``
  before resorting to it.

Both modes produce bit-identical rule sequences (tested): greedy
left-to-right merge, overlaps consume the left occurrence, ties in pair
frequency break on (left, right) lexicographic order, so the rule sequence
is reproducible across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import tokens_col


def _chars(col):
    """Split a string column into its character array (JVM-side)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
    )


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules on the corpus; returns a
    DataFrame (rank, left, right, merged, pair_count) in merge order.
    Stops early when no adjacent pair remains."""
    spark: SparkSession = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select("freq", _chars(F.col("w")).alias("syms"))
        .localCheckpoint(eager=True)
    )

    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = words.select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                )
            ).alias("p"),
        ).select(F.col("p.0").alias("l"), F.col("p.1").alias("r"), "freq")
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0].l, best[0].r, best[0].cnt
        m = l + r
        rules.append((rank, l, r, m, cnt))

        # greedy left-to-right merge: fold each word's symbols, replacing
        # a trailing `l` followed by `r` with the merged symbol
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select("freq", merged.alias("syms")).localCheckpoint(
            eager=True
        )

    return spark.createDataFrame(
        rules, "rank long, left string, right string, merged string, pair_count long"
    )


def bpe_apply(
    docs: DataFrame,
    rules: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply trained merge rules: (doc_id, n_words, n_bpe_tokens) per doc.

    The rules are applied to the DISTINCT word table (vocabulary-bounded —
    each rule is one JVM fold over a word's symbol array, in training
    order), and documents join the tokenized vocabulary back by word: the
    expensive rewrite never touches the corpus, only the vocabulary. This
    is the standard apply-side trick — tokenization is a dictionary
    lookup at corpus scale.
    """
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .distinct()
        .select("w", _chars(F.col("w")).alias("syms"))
    )
    def _merge_step(l: str, r: str, m: str):
        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(l))
                & (x == F.lit(r)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    for l, r in rules:
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            _merge_step(l, r, l + r),
        )
        vocab = vocab.select("w", merged.alias("syms"))
    sized = vocab.select("w", F.size("syms").alias("n_syms"))
    return (
        docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("w"))
        .join(sized, "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )
