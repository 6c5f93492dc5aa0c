"""Invariant tests for the round-4 dataprep/analytics operators, beyond
the oracle hash checks: structural properties that must hold for ANY
corpus, not just the shipped testdata."""

from __future__ import annotations

from aind_exaspim_data_transformation_spark.queries import QUERIES

from conftest import SF_SMALL

SEQ_LEN = 512


def test_pack_sequences_tokens_are_conserved_and_contiguous(spark):
    rows = sorted(
        QUERIES["q_docs_pack_sequences"](spark, SF_SMALL).collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    total = sum(r["n_tokens"] for r in rows)
    assert max(r["global_start"] + r["n_tokens"] for r in rows) == total
    # The packed stream is gapless: each doc starts where the previous
    # one (in (source, doc_id) order) ended.
    pos = 0
    for r in rows:
        assert r["global_start"] == pos
        assert r["first_example"] == r["global_start"] // SEQ_LEN
        assert (
            r["last_example"]
            == (r["global_start"] + r["n_tokens"] - 1) // SEQ_LEN
        )
        assert r["first_example"] <= r["last_example"]
        pos += r["n_tokens"]


def test_temperature_sample_probabilities_and_determinism(spark):
    rows = QUERIES["q_docs_temperature_sample"](spark, SF_SMALL).collect()
    assert rows, "sample must keep something"
    for r in rows:
        assert 0.0 < r["keep_prob"] <= 1.0
        assert 0.0 <= r["u"] < r["keep_prob"]
    # Kept fraction lands near the 0.5 target (md5-uniforms, loose band).
    n_docs = 500
    assert 0.3 * n_docs <= len(rows) <= 0.7 * n_docs
    again = QUERIES["q_docs_temperature_sample"](spark, SF_SMALL).collect()
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again
    )


def test_gopher_fractions_bounded(spark):
    for r in QUERIES["q_text_gopher_repetition"](spark, SF_SMALL).collect():
        for col in (
            "top_unigram_frac",
            "dup_bigram_frac",
            "dup_trigram_frac",
        ):
            assert 0.0 <= r[col] <= 1.0, (r["doc_id"], col)
        expected_keep = (
            r["n_words"] >= 10
            and r["top_unigram_frac"] <= 0.20
            and r["dup_bigram_frac"] <= 0.60
            and r["dup_trigram_frac"] <= 0.50
        )
        assert r["keep"] == expected_keep


def test_pii_redaction_is_complete(spark):
    rows = QUERIES["q_text_pii_redact"](spark, SF_SMALL).collect()
    # Injection schedule: doc_id % 7 == 0 -> email, 3 -> phone, 5 -> ip.
    for r in rows:
        m = r["doc_id"] % 7
        assert r["n_emails"] == (1 if m == 0 else 0)
        assert r["n_phones"] == (1 if m == 3 else 0)
        assert r["n_ips"] == (1 if m == 5 else 0)


def test_ann_pq_topk_shape(spark):
    rows = QUERIES["q_ann_pq"](spark, SF_SMALL).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        assert -1.0 <= r["cos_sim"] <= 1.0
        assert r["qid"] != r["cid"]
    assert set(by_q) == {0, 1, 2}
    assert all(len(v) == 3 for v in by_q.values())


def test_kmeans_partitions_every_vector(spark):
    rows = QUERIES["q_kmeans_embeddings"](spark, SF_SMALL).collect()
    assert sum(r["n_members"] for r in rows) == 500
    assert len(rows) == len({r["k"] for r in rows}) <= 8
    assert all(r["centroid_norm"] > 0.0 for r in rows)


def test_gapfill_covers_every_cell(spark):
    rows = QUERIES["q_events_gapfill"](spark, SF_SMALL).collect()
    hours = {r["hour"] for r in rows}
    types = {r["event_type"] for r in rows}
    assert len(rows) == len(hours) * len(types)
    from aind_exaspim_data_transformation_spark.sources.tables import (
        load_table,
    )

    total = load_table(spark, SF_SMALL, "events").count()
    assert sum(r["n_events"] for r in rows) == total


def test_funnel_stage_ordering(spark):
    for r in QUERIES["q_events_funnel"](spark, SF_SMALL).collect():
        stage = r["funnel_stage"]
        have = [
            r["first_view"] is not None,
            r["first_click"] is not None,
            r["first_purchase"] is not None,
        ]
        assert stage == (3 if have[2] else 2 if have[1] else 1 if have[0] else 0)
        if stage == 3:
            assert r["first_view"] <= r["first_click"] <= r["first_purchase"]
        elif stage == 2:
            assert r["first_view"] <= r["first_click"]
