"""Declared query surface — drives ``__spark_entry__.py``.

Every operator claimed in SURVEY.md §2 has a named query here, registered
with :func:`registry.query`; most carry an equivalent DuckDB oracle SQL
string so the driver's correctness harness can hash-compare results.

Import side effects register the queries; keep the module list exhaustive.
"""

from . import (  # noqa: F401  (import for registration side effects)
    behavior_q,
    bpe32k_q,
    bpe_q,
    convert_q,
    dataprep_q,
    dedup_q,
    events_q,
    formats_q,
    grid_q,
    misc_q,
    modern_q,
    multimodal_q,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    scalars,
    setops,
    similarity_q,
    streaming_q,
    text_q,
    text_q2,
    tpch_tail_q,
    udf_q,
    windows,
    # Imported last ON PURPOSE (not alphabetical): registry order is
    # the driver-gate rotation's tie-break, and new queries must queue
    # BEHIND the older never-sampled names (round-14).
    similarity_adaptive_q,
)
from .registry import ORACLES, QUERIES, query

__all__ = ["QUERIES", "ORACLES", "query"]
