"""Scalar/vector/text expression helpers (re-exports).

The engine's function surface, grouped:
- scalar (reference §2.8): batch-id compose/parse, backoff, coalesce guards
  — ``operators.relational`` + ``iterator.backoff_ms``;
- vector: dot/norm/cosine folds — ``llmops.similarity``;
- text: tokens, shingles, fingerprints, quality — ``llmops.textstats`` /
  ``llmops.dedup``.
"""

from ..iterator import backoff_ms  # noqa: F401
from ..llmops.dedup import (  # noqa: F401
    content_hash,
    exploded_shingles,
    shingles_from_tokens,
    tokens_col,
    winnow_fingerprints,
    with_shingles,
)
from ..llmops.similarity import cosine_col, dot_col, norm_col  # noqa: F401
from ..llmops.sketches import (  # noqa: F401
    bloom_hit_col,
    md5_int,
    md5_int_sql,
)
from ..llmops.textstats import (  # noqa: F401
    prefix_fingerprint,
    quality_label,
    stopword_ratio,
    token_count,
    token_count_re,
)
from ..operators.relational import make_batch_id, parse_batch_id  # noqa: F401
