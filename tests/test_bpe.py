"""From-spec byte-level BPE tokenizer (round-10 verdict, Missing #1).

Pins the claims the oracle hash can't see: the in-rank-order
``str.replace`` fold equals CLASSIC iterative BPE (lowest-rank pair
present, merge all occurrences, repeat), encode round-trips, the
pandas fold matches the scalar fold, and the pinned merges table obeys
its structural invariants.
"""

import duckdb
import pandas as pd
import pytest

from aind_exaspim_data_transformation_spark.functions.bpe import (
    apply_merges,
    decode,
    encode,
    sql_token_count,
    token_count,
    token_count_series,
)
from aind_exaspim_data_transformation_spark.functions.bpe_merges import (
    MERGES,
    PUA_BASE,
)

from conftest import SF_SMALL

_RANKS = {pair: i for i, (pair, _) in enumerate(MERGES)}


def _classic_bpe(text: str) -> str:
    """Textbook BPE encode (Sennrich et al. 2016): repeatedly find the
    LOWEST-RANK adjacent pair present anywhere in the token sequence,
    merge all its occurrences left-to-right, until no ranked pair
    remains. The production fold must reach the same fixpoint."""
    tokens = list(text)
    while True:
        best = None
        for a, b in zip(tokens, tokens[1:]):
            r = _RANKS.get(a + b)
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            return "".join(tokens)
        pair, merged = MERGES[best]
        out, i = [], 0
        while i < len(tokens):
            if i + 1 < len(tokens) and tokens[i] + tokens[i + 1] == pair:
                out.append(merged)
                i += 2
            else:
                out.append(tokens[i])
                i += 1
        tokens = out


def _sample_texts() -> list[str]:
    con = duckdb.connect()
    rows = con.execute(
        "SELECT text FROM read_parquet(?) ORDER BY doc_id LIMIT 40",
        [f"{SF_SMALL}/documents.parquet"],
    ).fetchall()
    return [r[0] for r in rows]


def test_fold_equals_classic_bpe_on_corpus():
    for text in _sample_texts():
        assert apply_merges(text) == _classic_bpe(text)


def test_fold_equals_classic_bpe_on_adversarial_strings():
    # overlap runs, repeated merged outputs, merge-creates-earlier-pair
    # shapes — the cases where a wrong pass order would diverge
    for text in [
        "",
        "a",
        "aaaa",
        "aa aa aa",
        "the the the the",
        "ssssss",
        "er er ere rer",
        " s s s",
        "table scan table scan table scan",
        "a" * 100,
        " " * 50,
    ]:
        assert apply_merges(text) == _classic_bpe(text)


def test_encode_round_trips():
    for text in _sample_texts():
        toks = encode(text)
        assert decode(toks) == text
        assert token_count(text) == len(toks)
        # real compression, not a no-op tokenizer
        assert len(toks) < len(text)


def test_pandas_fold_matches_scalar():
    texts = _sample_texts()
    counts = token_count_series(pd.Series(texts)).tolist()
    assert counts == [token_count(t) for t in texts]


def test_merges_table_invariants():
    assert len(MERGES) == 256
    seen_outputs = set()
    for i, (pair, merged) in enumerate(MERGES):
        # output chars are PUA, assigned sequentially -> unique, and
        # guaranteed absent from the ASCII corpus
        assert ord(merged) == PUA_BASE + i
        assert merged not in seen_outputs
        seen_outputs.add(merged)
        # a pair references only base ASCII or EARLIER merge outputs
        assert len(pair) == 2
        for c in pair:
            assert ord(c) < 0x7F or (PUA_BASE <= ord(c) < PUA_BASE + i)


def test_trainer_is_deterministic_and_greedy():
    from tools.build_bpe_merges import train

    corpus = ["abab cdcd abab", "ab cd ab cd", "ababab"]
    m1 = train(corpus, 8)
    m2 = train(list(corpus), 8)
    assert m1 == m2
    # most frequent pair first: 'ab' occurs 8 times (incl. overlaps in
    # 'ababab'), more than any other pair
    assert m1[0][0] == "ab"


def test_sql_fold_matches_python_fold():
    con = duckdb.connect()
    texts = _sample_texts()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"('{t}')" for t in texts) + ") v(text)")
    sql = con.execute(
        f"SELECT {sql_token_count('text')} FROM t"
    ).fetchall()
    assert [r[0] for r in sql] == [token_count(t) for t in texts]


@pytest.mark.parametrize("name", ["q_text_bpe_tokens"])
def test_bpe_query_is_map_only(spark, name):
    """Tokenize never shuffles: scan -> pandas UDF, no Exchange."""
    from aind_exaspim_data_transformation_spark.queries import QUERIES

    df = QUERIES[name](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
