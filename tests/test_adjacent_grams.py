"""Round-14 optimization guard: `_helpers.adjacent_grams` must produce
exactly the gram lists the old transform/element_at idiom produced.

The helper replaced four quadratic-time shingle builders (minhash
signatures, ngram-jaccard, Gopher bigrams/trigrams, dup-5gram, the
training pipeline's dup2 signal) — the old form re-evaluated the words
expression inside the lambda once per element. These tests pin the
equivalence the rewrite relied on, on both ordinary and adversarial
word lists (shorter than k, exactly k, duplicates, empty strings).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.queries._helpers import (
    adjacent_grams,
)


def _old_grams(words, k):
    """The pre-round-14 idiom: transform over a slice, lambda indexes
    back into the words expression per element."""
    n = F.size(words)
    return F.transform(
        F.slice(words, 1, F.greatest(n - (k - 1), F.lit(0))),
        lambda w, i: F.concat_ws(
            " ",
            w,
            *[F.element_at(words, i + j) for j in range(2, k + 1)],
        ),
    )


CASES = [
    "alpha beta gamma delta epsilon",
    "one two",
    "single",
    "",
    "dup dup dup dup",
    "a b c",
    "x  y",  # double space -> empty token from split
]


@pytest.mark.parametrize("k", [2, 3, 5])
def test_matches_transform_form(spark, k):
    df = spark.createDataFrame([(t,) for t in CASES], "text string")
    words = F.split("text", " ")
    got = df.select(
        F.col("text"),
        adjacent_grams(words, k).alias("new"),
        _old_grams(words, k).alias("old"),
    ).collect()
    for row in got:
        assert row["new"] == row["old"], (k, row["text"])


@pytest.mark.parametrize("k", [2, 3])
def test_expected_values(spark, k):
    df = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    out = df.select(
        adjacent_grams(F.split("text", " "), k).alias("g")
    ).collect()[0]["g"]
    if k == 2:
        assert out == ["alpha beta", "beta gamma", "gamma delta"]
    else:
        assert out == ["alpha beta gamma", "beta gamma delta"]


def test_short_docs_empty(spark):
    df = spark.createDataFrame([("one",), ("",)], "text string")
    out = df.select(
        adjacent_grams(F.split("text", " "), 2).alias("g")
    ).collect()
    assert all(r["g"] == [] for r in out)
