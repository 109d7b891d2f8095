"""Sequence packing: assign documents to fixed token-budget bins for
training-batch construction.

Two variants with different semantics/cost trade-offs:

- ``pack_chunks`` — streaming chunk assignment: docs are taken in key
  order and a doc starts a new bin whenever the EXCLUSIVE running token
  total crosses a capacity multiple. A doc may straddle a boundary (its
  bin's total can exceed capacity by less than one doc) — this is the
  cheap, fully-declarative form (one window cumsum per group, no Python),
  matching how streaming tokenizer-packers chunk concatenated corpora.
- ``pack_greedy`` — first-fit sequential packing: a doc that would
  overflow the current bin CLOSES it and starts the next, so every bin's
  total is ≤ capacity (oversize single docs get a bin of their own).
  Inherently sequential per group → applyInPandas per pack group, with
  the group key as the parallelism unit.

Scale notes (100 TB): both shuffle once on the pack group (e.g. source);
groups are corpus shards, so parallelism = number of shards — choose a
group key with enough cardinality (source, or source×date). The greedy
variant streams each group through pandas in Arrow batches; state is two
scalars per group (current bin id + fill), memory O(group rows).

No reference counterpart (north-star addition, SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col
from .textstats import token_count


def _with_tokens(docs: DataFrame, group_col: str, id_col: str, text_col: str) -> DataFrame:
    # NULL text (failed fetch, tombstoned row) packs as 0 tokens: without
    # the coalesce the NULL count reaches pack_greedy's pandas stage as
    # NaN and the int schema kills the whole Arrow batch (the same
    # absent-input class the codec/LSH surfaces guard against); oracles
    # mirror with COALESCE(..., 0).
    return docs.select(
        F.col(group_col),
        F.col(id_col),
        F.coalesce(token_count(text_col), F.lit(0)).alias("n_tokens"),
    )


def pack_chunks(
    docs: DataFrame,
    capacity: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id) — streaming chunk assignment:
    bin_id = exclusive-cumsum(n_tokens) div capacity, per group in id order."""
    sized = _with_tokens(docs, group_col, id_col, text_col)
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return sized.select(
        group_col,
        id_col,
        "n_tokens",
        # floor, not cast: double→long CAST truncates in Spark but ROUNDS in
        # DuckDB — floor() is the portable integer division.
        F.floor((cum - F.col("n_tokens")) / capacity).alias("bin_id"),
    )


def pack_greedy(
    docs: DataFrame,
    capacity: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(group, doc_id, n_tokens, bin_id) — first-fit sequential packing:
    per group in id order, close the current bin when the next doc would
    overflow it. Every bin total ≤ capacity unless a single doc exceeds
    capacity alone."""
    sized = _with_tokens(docs, group_col, id_col, text_col)
    cap = capacity  # close over plain ints only (executor-side pickling)
    idc, grp = id_col, group_col

    def pack(pdf):
        pdf = pdf.sort_values(idc).reset_index(drop=True)
        bins = []
        bin_id, fill = 0, 0
        for nt in pdf["n_tokens"]:
            if fill > 0 and fill + nt > cap:
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            fill += nt
        pdf["bin_id"] = bins
        return pdf[[grp, idc, "n_tokens", "bin_id"]]

    # derive the key column types from the input — hardcoding string/long
    # here failed Arrow serialization for any caller whose group or id
    # column has another type (pack_chunks is type-agnostic the same way)
    grp_t = sized.schema[grp].dataType.simpleString()
    id_t = sized.schema[idc].dataType.simpleString()
    schema = f"{grp} {grp_t}, {idc} {id_t}, n_tokens int, bin_id long"
    return sized.groupBy(grp).applyInPandas(pack, schema=schema)


def cdc_chunks(
    docs: DataFrame,
    group_col: str = "doc_id",
    text_col: str = "text",
    boundary_hex_prefix: str = "0",
) -> DataFrame:
    """Content-defined chunking: split each document at TOKEN-VALUE-determined
    boundaries instead of fixed offsets — (doc_id, chunk_idx, n_tokens)
    per chunk.

    A token starts a new chunk when md5(token) begins with
    ``boundary_hex_prefix`` (1 hex digit → boundary probability 1/16 →
    expected ~16-token chunks). Because boundaries depend only on content,
    an insertion early in a document shifts ONE chunk instead of
    re-chunking everything after it — the property that makes CDC the
    standard for dedup-friendly splitting of long documents.

    Plan: posexplode tokens (map-side) → one window cumsum per doc for the
    chunk index → count per (doc, chunk). Both stateful steps key on
    doc_id, so data shuffles on the document key once and stays there.
    """
    toks = docs.select(F.col(group_col), tokens_col(text_col).alias("t"))
    pos = toks.select(
        F.col(group_col), F.posexplode("t").alias("pos", "w")
    )
    boundary = F.when(
        (F.col("pos") > 0)
        & F.substring(F.md5("w"), 1, len(boundary_hex_prefix)).eqNullSafe(
            boundary_hex_prefix
        ),
        1,
    ).otherwise(0)
    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = pos.select(
        F.col(group_col), F.sum(boundary).over(w_cum).alias("chunk_idx")
    )
    return chunked.groupBy(group_col, "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
