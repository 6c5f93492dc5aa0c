"""The adaptive shortlist dial (round 14).

Pins the mechanism behind q_ann_pq_adaptive_r /
q_ann_ivfpq_residual_adaptive_r: the in-plan bound
R = max(_PQ_R, N // _PQ_ADAPTIVE_DIV) must (a) equal the fixed
literal below the bind point — the registered queries are
hash-identical to their fixed-R twins at the driver-gate SFs — and
(b) actually WIDEN the shortlist once the corpus outgrows
R * divisor, which is the scale behavior the r14 recall sweep showed
fixed R=100 lacks (recall@3 0.96 at 500 vectors -> 0.15 at 2M).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.queries import (
    QUERIES,
    similarity_q as sq,
)
from conftest import SF_SMALL


def _fake_adc(spark, n_candidates: int):
    """One query, n_candidates ranked ADC rows (approx_d2 == cid)."""
    return spark.range(1, n_candidates + 1).select(
        F.lit(0).alias("qid"),
        F.col("id").alias("cid"),
        F.col("id").cast("double").alias("approx_d2"),
    )


def test_dial_inactive_below_bind_point(spark):
    # N=500, div=2000 -> N//div = 0 -> dial = _PQ_R exactly.
    emb = spark.range(500)
    out = sq._adc_shortlist(
        _fake_adc(spark, 300), emb, sq._PQ_R, adaptive_r=True
    )
    assert out.count() == min(300, sq._PQ_R) == 100


def test_dial_widens_shortlist_past_bind_point(spark, monkeypatch):
    # Shrink the divisor so a unit-test-sized corpus crosses the bind
    # point: N=500, div=4 -> dial = max(100, 125) = 125.
    monkeypatch.setattr(sq, "_PQ_ADAPTIVE_DIV", 4)
    emb = spark.range(500)
    adaptive = sq._adc_shortlist(
        _fake_adc(spark, 300), emb, sq._PQ_R, adaptive_r=True
    )
    fixed = sq._adc_shortlist(
        _fake_adc(spark, 300), emb, sq._PQ_R, adaptive_r=False
    )
    assert fixed.count() == 100
    assert adaptive.count() == 125


def test_adaptive_matches_fixed_below_bind_point(spark):
    """At sf0.001 (500 vectors) the dial evaluates to the literal, so
    the adaptive query must return EXACTLY the fixed query's rows —
    same plan semantics, one extra broadcast."""
    fixed = {
        tuple(r)
        for r in QUERIES["q_ann_pq"](spark, SF_SMALL).collect()
    }
    adaptive = {
        tuple(r)
        for r in QUERIES["q_ann_pq_adaptive_r"](
            spark, SF_SMALL
        ).collect()
    }
    assert fixed == adaptive and len(fixed) > 0


def test_adaptive_oracle_carries_the_dial():
    from aind_exaspim_data_transformation_spark.queries import (
        ORACLES,
        similarity_adaptive_q as aq,
    )

    for name in (
        "q_ann_pq_adaptive_r",
        "q_ann_ivfpq_residual_adaptive_r",
    ):
        sql = ORACLES[name]
        assert aq._SQL_ADAPTIVE_R in sql
        # the fixed literal must be gone from the shortlist filter
        assert f"WHERE rn <= {sq._PQ_R})" not in sql


def test_new_queries_queue_behind_pending_rotation():
    """Round-14 invariant: the adaptive queries must NOT displace the
    51 older never-driver-sampled names from the driver's first-50
    sample (verdict Next #1)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "entry",
        os.path.join(os.path.dirname(__file__), "..",
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    order = list(mod.queries())
    tail = order[order.index("q_window_vs_group_avg"):]
    assert "q_ann_pq_adaptive_r" in tail
    assert "q_ann_ivfpq_residual_adaptive_r" in tail
