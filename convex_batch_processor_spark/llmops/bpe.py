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
    """Split a string column into its character array (JVM-side).

    Guarded for the empty string: sequence(1, 0) is the DESCENDING [1, 0]
    in Spark (the shingles_from_tokens trap), which would yield two
    empty-string symbols where local mode's list('') yields none."""
    return F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)), lambda i: col.substr(i, F.lit(1))
        ),
    ).otherwise(F.array().cast("array<string>"))


def _merge_fold(l: str, r: str, m: str):
    """The greedy left-to-right BPE merge as one fold step: replace a
    trailing ``l`` followed by ``r`` with ``m``. ONE definition shared by
    the distributed training loop and bpe_apply — the two copies had to
    be kept bit-identical for train/apply parity."""

    def step(acc, x):
        return F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (x == F.lit(r)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(m))),
        ).otherwise(F.concat(acc, F.array(x)))

    return step


_RULES_SCHEMA = "rank long, left string, right string, merged string, pair_count long"


def _train_local(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """Exact classic BPE over an in-memory (symbols, freq) word list.

    Incremental: pair counts are maintained under a lazy max-heap (stale
    entries are discarded at pop; every count increase pushes a fresh
    entry) plus an inverted pair→word-index so each merge touches only the
    words that contain the pair. Pair counts include overlapping adjacent
    positions ("aaa" counts (a,a) twice) and the rewrite is greedy
    left-to-right with the left occurrence consuming overlaps — identical
    to the distributed fold and the python reference in tests.
    """
    import heapq

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    heap: list[tuple[int, tuple[str, str]]] = []

    def index_word(i: int, sign: int, track: set | None = None) -> None:
        syms, f = words[i]
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + sign * f
            if sign > 0:
                where.setdefault(p, set()).add(i)
            if track is not None:
                track.add(p)

    for i in range(len(words)):
        index_word(i, +1)
    for p, c in counts.items():
        if c > 0:
            heapq.heappush(heap, (-c, p))

    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if counts.get(p, 0) == -negc:  # live entry: this IS the max
                best = (-negc, p)
                break
            # stale: a newer entry (or none, if the count only ever
            # dropped) represents this pair's current value
        if best is None:
            break
        cnt, (left, right) = best
        m = left + right
        rules.append((rank, left, right, m, cnt))
        touched: set[tuple[str, str]] = set()
        for i in sorted(where.get((left, right), ())):
            syms, f = words[i]
            out: list[str] = []
            j = 0
            changed = False
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == left and syms[j + 1] == right:
                    out.append(m)
                    j += 2
                    changed = True
                else:
                    out.append(syms[j])
                    j += 1
            if not changed:  # stale index entry — pair already rewritten away
                continue
            index_word(i, -1, touched)
            words[i] = (out, f)
            index_word(i, +1, touched)
        where.pop((left, right), None)
        counts.pop((left, right), None)
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
    return rules


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    mode: str = "auto",
    min_freq: int = 1,
    max_local_vocab: int = 4_000_000,
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules on the corpus; returns a
    DataFrame (rank, left, right, merged, pair_count) in merge order.
    Stops early when no adjacent pair remains.

    ``mode``: "local" collects the vocabulary-bounded word-frequency table
    and trains driver-side (exact, zero jobs per rule — the 100 TB path,
    see module docstring); "distributed" runs one Spark job per rule for
    vocabularies beyond driver memory; "auto" picks local iff the
    (``min_freq``-pruned) vocabulary has at most ``max_local_vocab`` words.
    ``min_freq`` drops hapax/noise words from training (standard practice;
    default 1 = keep everything).
    """
    if mode not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown mode {mode!r}")
    spark: SparkSession = docs.sparkSession
    wc = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        wc = wc.filter(F.col("freq") >= min_freq)
    wc = wc.localCheckpoint(eager=True)
    if mode == "auto":
        mode = "local" if wc.count() <= max_local_vocab else "distributed"
    if mode == "local":
        word_list = [(list(r["w"]), r["freq"]) for r in wc.collect()]
        return spark.createDataFrame(
            _train_local(word_list, n_merges), _RULES_SCHEMA
        )

    words = wc.select("freq", _chars(F.col("w")).alias("syms")).localCheckpoint(
        eager=True
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

        # greedy left-to-right merge via the shared fold (_merge_fold)
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            _merge_fold(l, r, m),
        )
        words = words.select("freq", merged.alias("syms")).localCheckpoint(
            eager=True
        )

    return spark.createDataFrame(rules, _RULES_SCHEMA)


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
    for i, (l, r) in enumerate(rules):
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            _merge_fold(l, r, l + r),
        )
        vocab = vocab.select("w", merged.alias("syms"))
        # bound the Catalyst tree: each rule nests another higher-order
        # aggregate into ONE collapsed projection — at real vocabularies
        # (hundreds+ of rules) analysis/codegen blows up without the same
        # periodic materialization the training loop applies every round;
        # the vocab table is DISTINCT WORDS, so each checkpoint is small
        if (i + 1) % 16 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    sized = vocab.select("w", F.size("syms").alias("n_syms"))
    # explode_outer + left join: a doc whose text is NULL or token-free
    # must still emit an accounted (doc_id, 0, 0) row — the inner join
    # silently dropped it, breaking the package's row-accounting
    # convention (_null_feature_row)
    return (
        docs.select(F.col(id_col), F.explode_outer(tokens_col(text_col)).alias("w"))
        .join(sized, "w", "left")
        .groupBy(id_col)
        .agg(
            F.count("w").alias("n_words"),
            F.coalesce(F.sum("n_syms"), F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )
