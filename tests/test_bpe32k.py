"""Production-vocabulary BPE (32k merges) — round-11 verdict, Next #1.

Pins what the oracle hashes can't see directly:

- the linear-time HEAP encoder equals classic iterative
  lowest-rank-first BPE AND the rank-order replace-chain fold (the
  semantics the DuckDB oracle computes), on real corpus docs, on
  adversarial shapes, and under hypothesis-generated text;
- encode/decode round-trips at full vocabulary;
- the incremental trainer reproduces the naive trainer's merge
  sequence (both min_frequency postures) and is deterministic;
- the pinned 32,768-merge artifact obeys its structural invariants
  (sequential PUA outputs, pairs reference only base chars or earlier
  outputs, freq>=2 prefix boundary recorded).
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from aind_exaspim_data_transformation_spark.functions import bpe32k as B
from aind_exaspim_data_transformation_spark.functions.bpe_vocab_32k import (
    FREQ2_MERGES,
    N_MERGES,
    PUA32_BASE,
)

from conftest import SF_SMALL

_ALPHABET = " abcdefghijklmnopqrstuvwxyz"


def _chain(text: str, n_ranks: int | None = None) -> str:
    """Rank-order replace-chain fold — the DuckDB oracle's semantics
    (O(vocab x len), test-only)."""
    limit = B.N_MERGES if n_ranks is None else n_ranks
    for rank in range(limit):
        text = text.replace(B.PAIRS[rank], chr(B.PUA32_BASE + rank))
    return text


def _classic(text: str, n_ranks: int | None = None) -> str:
    """Textbook iterative BPE: merge the lowest-rank pair present,
    all occurrences left-to-right, repeat (test-only)."""
    limit = B.N_MERGES if n_ranks is None else n_ranks
    tokens = list(text)
    while True:
        best = None
        for a, b in zip(tokens, tokens[1:]):
            r = B.RANKS.get(a + b)
            if r is not None and r < limit and (best is None or r < best):
                best = r
        if best is None:
            return "".join(tokens)
        pair, merged = B.PAIRS[best], chr(B.PUA32_BASE + best)
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] + tokens[i + 1] == pair:
                out.append(merged)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        tokens = out


def _sample_texts(limit: int = 40) -> list[str]:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet(?) ORDER BY doc_id LIMIT {limit}",
        [f"{SF_SMALL}/documents.parquet"],
    ).fetchall()
    return [r[0] for r in rows]


def test_heap_equals_chain_and_classic_on_corpus():
    for text in _sample_texts():
        h = B.apply_merges(text)
        assert h == _chain(text)
        assert h == _classic(text)


def test_heap_equals_chain_on_prefix_ranks():
    for text in _sample_texts(20):
        for n_ranks in (0, 1, 37, 512):
            assert B.apply_merges(text, n_ranks) == _chain(text, n_ranks)


def test_heap_on_adversarial_strings():
    for text in [
        "",
        "a",
        "  ",
        "ssssss",
        "aa aa aa",
        "the the the the",
        "table scan table scan table scan",
        "a" * 100,
        " " * 50,
        "merge batch merge batch merge batch merge batch",
    ]:
        assert B.apply_merges(text) == _classic(text)
        assert B.apply_merges(text) == _chain(text)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=120))
def test_heap_equals_classic_hypothesis(text):
    assert B.apply_merges(text) == _classic(text)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=60))
def test_heap_equals_chain_prefix_hypothesis(text):
    assert B.apply_merges(text, 512) == _chain(text, 512)


def test_round_trip_and_counts():
    for text in _sample_texts():
        toks = B.encode(text)
        assert B.decode(toks) == text
        assert B.detokenize_mapped(B.apply_merges(text)) == text
        assert B.token_count(text) == len(toks)
        # a 32k vocabulary compresses much harder than the 256 table
        assert len(toks) * 4 < len(text)


def test_pandas_series_matches_scalar():
    texts = _sample_texts(20)
    counts = B.token_count_series(pd.Series(texts)).tolist()
    assert counts == [B.token_count(t) for t in texts]
    p512 = B.token_count_series(pd.Series(texts), 512).tolist()
    assert p512 == [B.token_count(t, 512) for t in texts]


def test_vocab_artifact_invariants():
    assert N_MERGES == 32768
    assert len(B.PAIRS) == N_MERGES
    assert 0 < FREQ2_MERGES <= N_MERGES
    assert len(B.RANKS) == N_MERGES  # pairs are unique
    for i, pair in enumerate(B.PAIRS):
        assert len(pair) == 2
        for c in pair:
            # base ASCII or an EARLIER merge output only
            assert ord(c) < 0x7F or (PUA32_BASE <= ord(c) < PUA32_BASE + i)


def test_expansion_map_is_consistent():
    exp = B.expansion()
    assert len(exp) == N_MERGES
    for rank, pair in enumerate(B.PAIRS[:1000]):
        merged = chr(PUA32_BASE + rank)
        assert exp[merged] == "".join(exp.get(c, c) for c in pair)
        # expansions are pure corpus alphabet
        assert all(c in _ALPHABET for c in exp[merged])


def test_incremental_trainer_equals_naive():
    from tools.build_bpe_merges import train as naive_train
    from tools.build_bpe_vocab32k import train as fast_train

    corpus = _sample_texts(60)
    naive = naive_train(corpus, 400)
    fast = fast_train(corpus, 400, pua_base=0xE000)
    assert fast == naive


def test_incremental_trainer_min_frequency_one():
    from tools.build_bpe_vocab32k import train as fast_train

    corpus = ["abab cdcd", "ab cd", "xyz"]
    counts: list[int] = []
    merges = fast_train(
        corpus, 50, pua_base=0xE000, min_frequency=1, counts_out=counts
    )
    m2 = fast_train(list(corpus), 50, pua_base=0xE000, min_frequency=1)
    assert merges == m2  # deterministic
    # max-count-first: selection counts are non-increasing, so every
    # freq>=2 merge precedes every singleton merge
    assert counts == sorted(counts, reverse=True)
    assert counts[0] >= 2 and counts[-1] == 1
    # singleton merging still terminates with a valid tokenization
    for text in corpus:
        mapped = text
        for pair, merged in merges:
            mapped = mapped.replace(pair, merged)
        exp = {m: p for p, m in merges}

        def expand(s: str) -> str:
            out = []
            for c in s:
                out.append(expand(exp[c]) if c in exp else c)
            return "".join(out)

        assert expand(mapped) == text


def test_sql_fold_matches_heap_prefix512():
    con = duckdb.connect()
    texts = _sample_texts(15)
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS text", [texts]
    )
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {B.sql_token_count32k('text', 512)} FROM t"
        ).fetchall()
    ]
    assert got == [B.token_count(t, 512) for t in texts]


def test_sql_fold_matches_heap_full_vocab():
    # ~5 s: the full 32,768-step fold over 5 docs — kept small on
    # purpose; sweep-scale exactness rides on the prefix-512 fold and
    # the md5 roundtrip (see queries/bpe32k_q.py docstring).
    con = duckdb.connect()
    texts = _sample_texts(5)
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS text", [texts]
    )
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {B.sql_token_count32k('text')} FROM t"
        ).fetchall()
    ]
    assert got == [B.token_count(t) for t in texts]


def test_encode_rejects_pua_input():
    # Contract (round-12 advice): code points >= U+F0000 are the merged-
    # token alphabet; a document containing one must fail loudly instead
    # of aliasing a token and corrupting detokenize/token counts.
    import pytest

    for poison in ("abc\U000F0000def", "\U000F7FFF", "x\U0010FFFFy"):
        with pytest.raises(ValueError, match="U\\+F0000"):
            B.apply_merges(poison)
    # Boundary: the last pre-PUA code point is still legal input.
    assert B.token_count("ab\U000EFFFF") >= 1


def test_sql_fold_rejects_pua_input():
    # Round-13 advice: the DuckDB oracle twin must mirror the Spark
    # side's input contract — a plane-15/16 code point fails the oracle
    # loudly instead of silently encoding while Spark hard-fails.
    import pytest

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(?) AS text",
        [["fine", "poison\U000F0000"]],
    )
    with pytest.raises(Exception, match="U\\+F0000"):
        con.execute(
            f"SELECT {B.sql_token_count32k('text', 8)} FROM t"
        ).fetchall()
    # Clean input through the guarded fold still matches the encoder.
    con.execute("DELETE FROM t WHERE text LIKE 'poison%'")
    (got,) = con.execute(
        f"SELECT {B.sql_token_count32k('text', 8)} FROM t"
    ).fetchone()
    assert got == B.token_count("fine", 8)
    # Boundary: last pre-PUA code point passes the SQL guard too.
    con.execute("UPDATE t SET text = 'ab' || chr(983039)")  # U+EFFFF
    (got,) = con.execute(
        f"SELECT {B.sql_token_count32k('text', 8)} FROM t"
    ).fetchone()
    assert got >= 1
