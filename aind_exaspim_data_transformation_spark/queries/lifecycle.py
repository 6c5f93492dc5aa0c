"""Cache lifecycle for the query library's persisted intermediates.

Three registry queries persist an intermediate relation at plan-build
time (`q_minhash_lsh_pairs_capped`'s shared signatures,
`q_text_dup_5gram_corpus`'s inverted index,
`q_docs_training_pipeline`'s survivor metadata). A registry function
returns a LAZY DataFrame, so it cannot unpersist its own intermediates
— under the oracle harness (one short-lived session per sweep) that is
fine, but a long-lived production session would accumulate cached
blocks across calls.

:func:`managed_query` is the production entry point: it runs a
registered query inside a tracking scope, yields the (still lazy)
result DataFrame, and on exit unpersists exactly the intermediates
that query persisted — nothing else the caller may have cached is
touched (unlike ``spark.catalog.clearCache()``).

Persist sites inside query functions opt in by routing through
:func:`track_persist` instead of calling ``.persist()`` directly; when
no tracking scope is active (the oracle harness path) the behavior is
byte-identical to a plain persist, so oracle hashes are unaffected.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

# Stack (not a single slot) so nested scopes — a managed query whose
# plan calls another registry function — each unpersist only their own
# intermediates. Plan construction is driver-side and single-threaded
# per session in this library, so a plain list suffices.
_ACTIVE: list[list[DataFrame]] = []


def track_persist(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    """Persist ``df`` and, if a :func:`managed_query` scope is active,
    register it for unpersist when the scope exits."""
    df = df.persist(level)
    if _ACTIVE:
        _ACTIVE[-1].append(df)
    return df


@contextmanager
def managed_query(
    spark: SparkSession, sf_dir: str, name: str
) -> Iterator[DataFrame]:
    """Run registry query ``name`` with owned cache lifecycle.

    Yields the lazy result DataFrame; the caller actions it inside the
    ``with`` block (collect/write/count). On exit every intermediate
    the query persisted is unpersisted (blocking, so storage is
    verifiably freed when the block closes).
    """
    from aind_exaspim_data_transformation_spark.queries import QUERIES

    tracked: list[DataFrame] = []
    _ACTIVE.append(tracked)
    try:
        yield QUERIES[name](spark, sf_dir)
    finally:
        _ACTIVE.pop()
        for cached in tracked:
            cached.unpersist(blocking=True)
