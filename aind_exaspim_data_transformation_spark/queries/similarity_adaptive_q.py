"""Adaptive-shortlist ANN queries — the production R-dial as a
first-class, oracle-pinned operator.

Round-14's recall-at-scale sweep (tools/ann_recall_scale.py, SCALE.md
5f) measured the flat-PQ/IVFPQ families' recall at a FIXED ADC
shortlist R=100 decaying as the corpus grows (recall@3 0.96 at 500
vectors -> 0.38 at 200k -> 0.15 at 2M) while R scaled with N holds
the floor (R=1000 at 2M: 0.47 / 0.50). These registered variants bake
that dial INTO the plan: R = max(100, N // 2000) is computed from a
1-row count aggregate broadcast onto the ranked candidates, so one
query text serves every corpus size — the Spark side and the DuckDB
oracle both evaluate the same scalar-subquery dial, and the hash gate
verifies the mechanism at every SF (the dial binds — returns a value
other than the 100 literal — from sf30's 600k vectors upward).

Registered in a module imported LAST so the driver-gate rotation
(__spark_entry__.queries(), least-recently-sampled first) finishes
sweeping the 51 older never-sampled names before these join the queue.

Reference parity note: the reference engine has no ANN surface; this
extends the aind-exaspim scope per the large-scale-training-pipeline
brief (SURVEY.md §2B similarity-search row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .similarity_q import (
    _PQ_ADAPTIVE_DIV,
    _PQ_R,
    _PQ_ORACLE,
    _ivfpq_oracle,
    ann_ivfpq_residual_topk,
    ann_pq_topk,
)

# DuckDB twin of the in-plan dial: COUNT(*) is BIGINT, `//` is floor
# division (exact match for Spark's floor(count / div) on a
# non-negative count), GREATEST promotes the literal.
_SQL_ADAPTIVE_R = (
    f"(SELECT GREATEST({_PQ_R}, CAST(COUNT(*) // {_PQ_ADAPTIVE_DIV}"
    f" AS BIGINT)) FROM embeddings)"
)


def _adaptive_oracle(base: str) -> str:
    """Swap the shortlist's literal R bound for the scalar-subquery
    dial. Only the ADC-shortlist filter matches ``rn <= {_PQ_R}``;
    the final top-k filter is ``rn <= 3``."""
    target = f"WHERE rn <= {_PQ_R})"
    assert base.count(target) == 1, "shortlist bound not unique"
    return base.replace(target, f"WHERE rn <= {_SQL_ADAPTIVE_R})")


@query("q_ann_pq_adaptive_r", oracle=_adaptive_oracle(_PQ_ORACLE))
def q_ann_pq_adaptive_r(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-PQ ANN with the in-plan adaptive shortlist dial."""
    return ann_pq_topk(spark, sf_dir, n_queries=3, k=3, adaptive_r=True)


@query(
    "q_ann_ivfpq_residual_adaptive_r",
    oracle=_adaptive_oracle(_ivfpq_oracle()),
)
def q_ann_ivfpq_residual_adaptive_r(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVF-PQ residual ANN with the in-plan adaptive shortlist dial."""
    return ann_ivfpq_residual_topk(
        spark, sf_dir, n_queries=3, k=3, adaptive_r=True
    )
