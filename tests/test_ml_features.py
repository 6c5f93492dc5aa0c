"""pyspark.ml feature operators (SURVEY §2B north-star row): MinHashLSH
similarity join cross-checked against the exact Jaccard query, and the
Tokenizer -> HashingTF -> IDF pipeline.

These use Spark ML's own (seeded) hash families, so there is no DuckDB
oracle — correctness is established by recall against the engine's exact
operators.
"""

import pytest
from pyspark.ml.feature import (
    IDF,
    CountVectorizer,
    HashingTF,
    MinHashLSH,
    Tokenizer,
)
from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.queries import QUERIES
from aind_exaspim_data_transformation_spark.sources.tables import load_table

from conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_minhash_lsh_finds_exact_jaccard_pairs(spark, docs):
    # vectorize distinct-word sets
    tokens = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    cv = CountVectorizer(
        inputCol="words", outputCol="features", binary=True
    ).fit(tokens)
    vecs = cv.transform(tokens).select("doc_id", "features")
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=8, seed=42
    ).fit(vecs)
    # distance threshold 0.6 => jaccard similarity >= 0.4
    pairs = (
        lsh.approxSimilarityJoin(vecs, vecs, 0.6, distCol="dist")
        .where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
        )
    )
    found = {(r["a"], r["b"]) for r in pairs.collect()}
    # ground truth: the exact 2-gram jaccard pairs (>= 0.10 threshold) are
    # highly similar docs; their unigram jaccard is >= 0.4 here.
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q_ngram_jaccard_pairs"](spark, SF_SMALL).collect()
    }
    assert exact, "fixture should contain at least one near-dup pair"
    recall = len(exact & found) / len(exact)
    assert recall >= 0.99, f"LSH missed exact near-dups: {exact - found}"


def test_tokenizer_hashingtf_idf_pipeline(spark, docs):
    tokens = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    tf = HashingTF(
        inputCol="words", outputCol="raw", numFeatures=1 << 12
    ).transform(tokens)
    idf_model = IDF(inputCol="raw", outputCol="tfidf").fit(tf)
    out = idf_model.transform(tf).select("doc_id", "tfidf")
    rows = out.limit(5).collect()
    assert all(r["tfidf"].size == 1 << 12 for r in rows)
    # idf weights: non-negative, and rare terms weigh more than common
    assert float(idf_model.idf.toArray().min()) >= 0.0
    n_nonzero = sum(r["tfidf"].numNonzeros() for r in rows)
    assert n_nonzero > 0
