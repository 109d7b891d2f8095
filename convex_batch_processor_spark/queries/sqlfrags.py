"""Shared DuckDB oracle SQL fragments.

Lives in its own module (registering NOTHING) because query modules must
be importable without side effects: importing a sibling query module for
a string constant would run its @register calls and scramble the
registration order the driver-window rotation depends on (the round-4
lesson — llm5 importing llm2 pushed llm2's 13 queries into the window).
"""

def kmeans_d2(dim: int = 64) -> str:
    """Squared-L2 distance between a corpus row ``e`` and a centroid row
    ``c`` — list_dot_product of the diff with itself, the proven bit-exact
    twin of Spark's sequential zip_with/aggregate fold.

    NULL-guarded: a NULL vector's list_transform yields a list OF NULLs,
    which list_dot_product rejects outright — the guard returns NULL
    instead (CASE is lazy), mirroring Spark's NULL zip_with fold, so
    assignment CTEs can run over the FULL corpus and a NULL vector falls
    to the cluster_id tiebreak with a NULL distance (the verified
    ivf_centroid_assign convention)."""
    d1 = dim + 1
    return (
        f"CASE WHEN e.v IS NULL THEN NULL ELSE list_dot_product("
        f"list_transform(range(1, {d1}), i -> e.v[i] - c.centroid[i]), "
        f"list_transform(range(1, {d1}), i -> e.v[i] - c.centroid[i])) END"
    )


def kmeans_chain(
    k: int, n_iter: int, dim: int, src: str = "e", prefix: str = ""
) -> str:
    """Lloyd's k-means unrolled to a CTE chain ``{prefix}c0, {prefix}a1,
    …, {prefix}c{n_iter}`` over source CTE ``src`` (columns vec_id,
    v DOUBLE[dim]) — replayable because kmeans_fit(round_dp=6) pins the
    model state to 6 dp after every round. ``prefix`` lets several
    independent fits coexist in one statement (the PQ subspace oracle).

    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs and the chain
    references each stage more than once — inlining grows the query tree
    exponentially in n_iter (the PCA-oracle lesson)."""
    d2 = kmeans_d2(dim)
    ctes = [
        f"""{prefix}c0 AS MATERIALIZED (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) - 1 AS cluster_id,
               v AS centroid
        FROM (SELECT vec_id, v FROM {src} ORDER BY vec_id LIMIT {k}))""",
    ]
    for it in range(1, n_iter + 1):
        ctes.append(f"""{prefix}a{it} AS MATERIALIZED (
        SELECT vec_id, v, cluster_id FROM (
            SELECT e.vec_id, e.v, c.cluster_id,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2} ASC, c.cluster_id ASC) AS rn
            FROM {src} e CROSS JOIN {prefix}c{it - 1} c) WHERE rn = 1)""")
        ctes.append(f"""{prefix}u{it} AS MATERIALIZED (
        SELECT cluster_id, list(m ORDER BY dim) AS centroid FROM (
            SELECT cluster_id, i AS dim, round(avg(v[i]), 6) AS m
            FROM {prefix}a{it}, unnest(range(1, {dim + 1})) AS t(i)
            GROUP BY 1, 2) GROUP BY 1)""")
        ctes.append(f"""{prefix}c{it} AS MATERIALIZED (
        SELECT p.cluster_id, coalesce(u.centroid, p.centroid) AS centroid
        FROM {prefix}c{it - 1} p LEFT JOIN {prefix}u{it} u USING (cluster_id))""")
    return ",".join(ctes)


def kmeans_ctes(k: int = 8, n_iter: int = 4, dim: int = 64) -> str:
    """``e`` (the cast embeddings table, ALL rows) + ``env`` (non-NULL
    vectors only) + the full-dimension kmeans chain trained over ``env``
    — Spark's kmeans_fit filters isNotNull before seeding/updating, so
    the replay must too, while assignment and labeling stay full-corpus
    (NULL vectors keep their rows with NULL distances)."""
    return (
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings),"
        "env AS MATERIALIZED (SELECT vec_id, v FROM e WHERE v IS NOT NULL),"
        + kmeans_chain(k, n_iter, dim, src="env")
    )


def kmeans_assign(
    n_iter: int = 4, dim: int = 64, src: str = "e", prefix: str = ""
) -> str:
    """Final-assignment CTE body over the trained ``{prefix}c{n_iter}``
    table: (vec_id, cluster_id, dist2) with the (dist2, cluster_id)
    tiebreak."""
    d2 = kmeans_d2(dim)
    return f"""
        SELECT vec_id, cluster_id, dist2 FROM (
            SELECT e.vec_id, c.cluster_id, {d2} AS dist2,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {d2} ASC, c.cluster_id ASC) AS rn
            FROM {src} e CROSS JOIN {prefix}c{n_iter} c) WHERE rn = 1"""


# Laplace-smoothed corpus bigram LM scores per doc: (doc_id, n_bigrams,
# avg_logp). Shared by lm_bigram_quality, training_pipeline_v2 (llm2) and
# ccnet_perplexity_buckets (llm5). Parity notes: ln leaf-rounded 9 dp,
# DECIMAL-accumulated sum (see llmops/retrieval.bigram_logprob_scores).
LM_CTES = """
    toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
        FROM toks WHERE len(t) >= 2
    ),
    c12 AS (SELECT bg, COUNT(*) AS c12 FROM big GROUP BY bg),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)),
    lp_scored AS (
        SELECT big.doc_id,
               round(ln((c12.c12 + 1.0) / (c1.c1 + vocab.v)), 9) AS lp
        FROM big JOIN c12 USING (bg) JOIN c1 USING (w1), vocab
    ),
    lm AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(lp AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_logp
        FROM lp_scored GROUP BY doc_id
    )
"""


def bm25_rank_ctes(terms: list[str], k: int, prefix: str) -> str:
    """CTE chain ``{prefix}tf .. {prefix}rnk`` producing the BM25 top-k
    ranking ``(doc_id, rnk)`` for a term list — the llm2 _BM25_SQL shape
    (k1=1.2, b=0.75, idf/score rounded 9/6 dp) parameterized so several
    retrieval runs can be fused in one statement (RRF). Expects the
    term-independent ``toks``/``dl``/``stats`` CTEs to exist already."""
    tl = ", ".join(f"'{t}'" for t in terms)
    cases = ",\n               ".join(
        f"MAX(CASE WHEN term = '{t}' THEN c END) AS c_{i}"
        for i, t in enumerate(terms)
    )
    total = " + ".join(f"coalesce(c_{i}, 0.0)" for i in range(len(terms)))
    return f"""{prefix}tf AS (
        SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks, unnest(t) AS u(term)
        WHERE term IN ({tl})
        GROUP BY doc_id, term
    ),
    {prefix}idf AS (
        SELECT term,
               round(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 9) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM {prefix}tf GROUP BY term) d, stats s
    ),
    {prefix}contrib AS (
        SELECT tf.doc_id, tf.term,
               idf.idf * (tf.tf * 2.2)
                 / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS c
        FROM {prefix}tf tf
        JOIN {prefix}idf idf USING (term)
        JOIN dl USING (doc_id), stats s
    ),
    {prefix}pivoted AS (
        SELECT doc_id, {cases}
        FROM {prefix}contrib GROUP BY doc_id
    ),
    {prefix}rnk AS (
        SELECT doc_id, rnk FROM (
            SELECT doc_id,
                   row_number() OVER (ORDER BY round(0.0 + {total}, 6) DESC,
                                               doc_id ASC) AS rnk
            FROM {prefix}pivoted)
        WHERE rnk <= {k}
    )"""


def plsh_pair_ctes(
    n_bands: int = 4,
    bits: int = 4,
    dim: int = 64,
    seed: int = 42,
    threshold: float = 0.42,
) -> str:
    """CTE chain ``psig, pcand, ppairs`` — the portable hyperplane-LSH
    cosine near-dup pairs (vec_id_a, vec_id_b, sim): sign-bit buckets of
    list_dot_product against the SAME 6-dp plane literals the Spark side
    bakes into its fold (sequential fold == list_dot_product bit-for-bit,
    NOTES), bucket equi-join candidates, exact 6-dp cosine rerank.
    DuckDB twin of similarity.cosine_neardup_pairs_portable — shared by
    cosine_lsh_portable_neardup (llm12) and semantic_dedup_keep (llm2)."""
    from ..llmops.similarity import _hyperplanes

    band_exprs = []
    for band in range(n_bands):
        planes = _hyperplanes(bits, dim, seed + band)
        bits_expr = " + ".join(
            f"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), "
            f"[{', '.join(repr(w) for w in p)}]) > 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        )
        band_exprs.append(
            # NOT NULL: DuckDB's list_dot_product ERRORS on a NULL list;
            # a NULL vector forms no signature, generates no candidates,
            # and falls through the consumers' LEFT JOINs as a singleton —
            # the Spark twin reaches the same pairs because its NULL
            # cosine fails the rerank threshold
            f"SELECT vec_id, {band} AS band, ({bits_expr}) AS bucket "
            f"FROM embeddings WHERE embedding IS NOT NULL"
        )
    sig = " UNION ALL ".join(band_exprs)
    cos = (
        "round(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))"
        " / NULLIF(sqrt(list_dot_product(CAST(ea.embedding AS DOUBLE[]), CAST(ea.embedding AS DOUBLE[])))"
        " * sqrt(list_dot_product(CAST(eb.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[]))), 0), 6)"
    )
    return f"""psig AS MATERIALIZED ({sig}),
    pcand AS (
        SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM psig a JOIN psig b ON a.band = b.band AND a.bucket = b.bucket
        WHERE a.vec_id < b.vec_id),
    ppairs AS MATERIALIZED (
        SELECT c.vec_id_a, c.vec_id_b, {cos} AS sim
        FROM pcand c
        JOIN embeddings ea ON ea.vec_id = c.vec_id_a
        JOIN embeddings eb ON eb.vec_id = c.vec_id_b
        WHERE {cos} > {threshold!r})"""


MINHASH_MD5_CTES = """toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(1, greatest(1, len(t) - 1)),
            i -> array_to_string(list_slice(t, i, i + 2), ' ')
        ))) AS shingle
        FROM toks WHERE len(t) >= 3
    ),
    hx AS (
        SELECT doc_id, b, md5(b || ':' || shingle) AS d
        FROM sh, unnest(range(0, 4)) AS u(b)
    ),
    sig AS (
        -- MIN the fixed-width hex slice as a string (lexicographic ==
        -- numeric), convert the survivor per group — mirrors the Spark
        -- side's conv-after-min (hex->int per shingle row measured 1.6x
        -- slower)
        SELECT doc_id, b * 4 + r AS p,
               CAST('0x' || MIN(substr(d, 8 * r + 1, 8)) AS BIGINT) AS h
        FROM hx, unnest(range(0, 4)) AS v(r) GROUP BY 1, 2
    ),
    bands AS (
        SELECT doc_id, p // 4 AS band_idx,
               array_to_string(list(h ORDER BY p), '|') AS band_key
        FROM sig GROUP BY doc_id, p // 4
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS i
        FROM cand c
        JOIN sh x ON x.doc_id = c.id_a
        JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
        GROUP BY 1, 2
    )"""
#: the engine-portable MinHash pipeline (signatures, bands, candidates,
#: shingle sizes, candidate intersections) — shared by the near-dup query
#: (llm5) and the LSH quality-evaluation query (llm50).
