"""Adversarial-skew proof for the capped pair generators (round-9
verdict, Next #5; mirrors tests/test_funnel_skew.py).

The worst case for any LSH/shingle pair generator is a corpus where one
band bucket (or one shingle posting list) holds the whole corpus: an
uncapped self-join then emits B(B-1)/2 candidates — 5e9 pairs for B=1e5
— and a single reducer absorbs them. The production guards
(MAX_BUCKET=20 band-bucket cap, NGRAM_MAX_DF=20 posting cap) drop those
degenerate groups BEFORE the join, so the worst case is linear in the
number of groups. This test proves it the hard way: a fresh JVM capped
at 512 MiB heap (local mode: driver == executor) runs BOTH capped
generators over 100k byte-identical documents — every band degenerate,
every shingle's posting list 100k long — plus 5 engineered near-dup
pairs, and must return exactly those 5 pairs. Without the caps this
workload is ~5e9 join rows; with them it must finish in bounded memory.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

N_POWER = 100_000
POWER_TEXT = (
    "the quick brown fox jumps over the lazy dog again and again while "
    "every band bucket of this corpus degenerates into one giant group"
)


def _write_skewed_documents(path: Path) -> None:
    doc_ids, texts = [], []
    # 100k byte-identical docs: identical minhash signatures => all 4
    # band buckets have 100k members; every 2-gram shingle has df=100k.
    for d in range(N_POWER):
        doc_ids.append(d)
        texts.append(POWER_TEXT)
    # 5 engineered near-dup pairs with pair-unique vocabularies: each
    # LSH band bucket has exactly 2 members (<= MAX_BUCKET), each
    # shingle's posting list is 2 (<= NGRAM_MAX_DF).
    for k in range(5):
        t = " ".join(f"pair{k}word{j}" for j in range(24))
        for m in range(2):
            doc_ids.append(1_000_000 + 2 * k + m)
            texts.append(t)
    n = len(doc_ids)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["web"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(path),
        row_group_size=10_000,
    )


_DRIVER = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("lsh-skew")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from aind_exaspim_data_transformation_spark.queries import QUERIES

    out = {{}}
    for name in ("q_minhash_lsh_pairs_capped", "q_ngram_jaccard_pairs"):
        rows = QUERIES[name](spark, {sf_dir!r}).collect()
        out[name] = sorted([r["doc_a"], r["doc_b"]] for r in rows)
    print("RESULT " + json.dumps(out))
    spark.stop()
    """
)


def test_capped_pair_generators_under_512m_heap(tmp_path):
    _write_skewed_documents(tmp_path / "documents.parquet")
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = "--driver-memory 512m pyspark-shell"
    script = _DRIVER.format(repo=str(REPO), sf_dir=str(tmp_path))
    proc = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    )
    got = json.loads(line[len("RESULT "):])
    expected = [
        [1_000_000 + 2 * k, 1_000_000 + 2 * k + 1] for k in range(5)
    ]
    # The degenerate block contributes ZERO pairs (its buckets/postings
    # are all above the caps); only the engineered pairs survive.
    assert got["q_minhash_lsh_pairs_capped"] == expected, got
    assert got["q_ngram_jaccard_pairs"] == expected, got
