"""Post-window round-4 additions, part 22 (round-5 rotation material):
MMR diverse top-k selection over the embedding corpus.

Registered last in queries/__init__.py (after llm28); oracle-backed via
an unrolled greedy CTE chain (the kmeans/token-pack replay recipe: all
floats pinned to integer micro-units, so the argmax sequence is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..llmops import similarity as S
from .registry import register

_POOL_N, _K, _LAM = 16, 6, 7  # lam = 0.7 in tenths

_COS6 = (
    "CAST(round(round(list_dot_product({a}, {b})"
    " / NULLIF(sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})), 0), 6) * 1000000) AS BIGINT)"
)


def _mmr_oracle(query_id: int = 0, pool_n: int = _POOL_N, k: int = _K) -> str:
    lam, mu = _LAM, 10 - _LAM
    rel6 = _COS6.format(a="e.v", b="q.qv")
    sim6 = _COS6.format(a="a.v", b="b.v")
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})",
        f"""pool AS MATERIALIZED (
        SELECT vec_id, r6 FROM (
            SELECT e.vec_id, {rel6} AS r6
            FROM e, q WHERE e.vec_id <> {query_id})
        WHERE r6 IS NOT NULL
        ORDER BY r6 DESC, vec_id ASC LIMIT {pool_n})""",
        """pe AS MATERIALIZED (
        SELECT p.vec_id, e.v FROM pool p JOIN e USING (vec_id))""",
        f"""sim AS MATERIALIZED (
        SELECT a.vec_id AS ia, b.vec_id AS ib, {sim6} AS s6
        FROM pe a JOIN pe b ON a.vec_id < b.vec_id)""",
        f"""sel1 AS MATERIALIZED (
        SELECT 1 AS sel_rank, vec_id, r6, {lam} * r6 AS sc10m
        FROM pool ORDER BY r6 DESC, vec_id ASC LIMIT 1)""",
        "acc1 AS MATERIALIZED (SELECT sel_rank, vec_id, r6, sc10m FROM sel1)",
    ]
    for step in range(2, k + 1):
        p = step - 1
        ctes.append(f"""sel{step} AS MATERIALIZED (
        SELECT {step} AS sel_rank, vec_id, r6, sc10m FROM (
            SELECT p.vec_id, p.r6,
                   {lam} * p.r6 - {mu} * (
                       SELECT MAX(s.s6) FROM sim s, acc{p} t
                       WHERE (s.ia = p.vec_id AND s.ib = t.vec_id)
                          OR (s.ib = p.vec_id AND s.ia = t.vec_id)) AS sc10m
            FROM pool p
            WHERE p.vec_id NOT IN (SELECT vec_id FROM acc{p}))
        ORDER BY sc10m DESC, vec_id ASC LIMIT 1)""")
        ctes.append(
            f"acc{step} AS MATERIALIZED "
            f"(SELECT * FROM acc{p} UNION ALL SELECT * FROM sel{step})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT sel_rank, vec_id, r6 / 1e6 AS rel, sc10m / 1e7 AS mmr_score
    FROM acc{k}"""
    )


@register("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-Marginal-Relevance top-6 from a 16-candidate ANN pool for
    query vector 0 (lambda = 0.7) — relevant-but-diverse retrieval, the
    post-recall step that stops RAG contexts filling up with near-copies.

    Relevance and pairwise cosines are pinned to 6-dp integer micro-units
    so the greedy is pure integer argmax with vec_id tiebreaks; the
    oracle replays all 6 selection steps as an unrolled CTE chain and
    must reproduce the identical (rank, id, score) sequence.

    Scale: one broadcast-map relevance pass over the corpus + one
    TakeOrdered(16); the sequential greedy touches only driver-bounded
    control-plane state (16 ids, 120 sims) — the corpus never feeds the
    loop. Column ``sel_rank`` (not ``rank``) keeps the oracle clear of
    the window-function keyword."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.mmr_select(emb, query_id=0, pool_n=_POOL_N, k=_K, lam_tenths=_LAM)
    return out.withColumnRenamed("rank", "sel_rank")
