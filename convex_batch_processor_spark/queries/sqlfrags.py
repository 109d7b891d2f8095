"""Shared DuckDB oracle SQL fragments.

Lives in its own module (registering NOTHING) because query modules must
be importable without side effects: importing a sibling query module for
a string constant would run its @register calls and scramble the
registration order the driver-window rotation depends on (the round-4
lesson — llm5 importing llm2 pushed llm2's 13 queries into the window).
"""

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
