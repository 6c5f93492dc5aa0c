"""Degenerate document shapes the generator never produces.

Spark's sequence(a, b) DESCENDS when a > b and element_at throws under
the default ANSI mode, so empty/single-word/short texts crashed (or
silently diverged from the oracle in) several text queries before
round 5's review pass. This fixture pins every fixed shape: empty
text, one word, text shorter than the winnowing gram, and text long
past the old 2000-position oracle cap."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aind_exaspim_data_transformation_spark.queries import QUERIES


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("edge_docs")
    texts = [
        "",  # empty
        "word",  # single word, 4 chars (< winnowing gram of 8)
        "exactly8",  # exactly the gram length
        "a b",  # minimal 2-gram doc
        # ~2900 varied chars: grams past the old 2000-position cap
        " ".join(f"word{i:03d}" for i in range(360)),
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": [f"src{i}" for i in range(len(texts))],
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(tmp / "documents.parquet"),
    )
    return str(tmp)


def test_decontaminate_handles_tiny_docs(spark, edge_dir):
    rows = {
        r["doc_id"]: (r["n_matched"], r["contaminated"])
        for r in QUERIES["q_text_decontaminate"](spark, edge_dir).collect()
    }
    assert rows[0] == (0, False)  # empty text: no shingles, no crash
    assert rows[1] == (0, False)  # single word: no shingles
    assert len(rows) == 5


def test_winnowing_short_and_long_texts(spark, edge_dir):
    rows = QUERIES["q_text_winnowing"](spark, edge_dir).collect()
    by_doc: dict[int, int] = {}
    for r in rows:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + 1
    # < 8 chars: zero grams, zero fingerprints (no bogus negatives)
    assert 0 not in by_doc and 1 not in by_doc
    # exactly 8 chars: exactly one gram position
    assert by_doc[2] >= 1
    # 2799 chars: fingerprints must cover positions past the old
    # 2000-index oracle cap (distinct-min windows, so just nonempty
    # and plentiful)
    assert by_doc[4] > 10


def test_chunk_grid_empty_payload(spark, edge_dir):
    rows = QUERIES["q_multimodal_chunk_grid"](spark, edge_dir).collect()
    assert all(r["doc_id"] != 0 for r in rows)  # empty text: no chunks
    assert all(r["chunk_idx"] >= 0 for r in rows)
    one_word = [r for r in rows if r["doc_id"] == 1]
    assert len(one_word) == 1 and one_word[0]["chunk_len"] == 4


def test_minhash_skips_shingle_less_docs(spark, edge_dir):
    rows = QUERIES["q_minhash_signatures"](spark, edge_dir).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {3, 4}  # only docs with >= 2 words sign
