"""Dedup/similarity family at scale: timings + LSH band-bucket audit.

Round-5 verdict item: sf1 covered the relational corpus; this runs the
dedup/LSH/ANN/training-pipeline family against a larger documents/
embeddings set (default: the locally generated .localdata/sf1, 10x the
driver's sf0.1 corpus), records wall time + output rows per query, the
band-bucket size histogram, and verifies the capped variant's
max-bucket bound.

    python tools/dedup_scale.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from aind_exaspim_data_transformation_spark.queries import QUERIES  # noqa: E402
from aind_exaspim_data_transformation_spark.queries.dedup_q import (  # noqa: E402
    MAX_BUCKET,
    N_BANDS,
    N_HASHES,
    _minhash_signatures,
)
from aind_exaspim_data_transformation_spark.session import get_spark  # noqa: E402

FAMILY = [
    "q_dedup_exact",
    "q_dedup_by_key",
    "q_minhash_signatures",
    "q_minhash_lsh_pairs",
    "q_minhash_lsh_pairs_capped",
    "q_dedup_clusters",
    "q_simhash",
    "q_ngram_jaccard_pairs",
    "q_text_dup_5gram_corpus",
    "q_docs_temperature_sample",
    "q_docs_pack_sequences",
    "q_docs_training_pipeline",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_ann_pq",
    "q_kmeans_embeddings",
    "q_knn_bruteforce",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    spark = get_spark("dedup-scale", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, dict] = {}
    for name in FAMILY:
        spark.catalog.clearCache()  # per-query cache contract
        t0 = time.monotonic()
        n = QUERIES[name](spark, sf_dir).count()
        timings[name] = {
            "sec": round(time.monotonic() - t0, 3),
            "rows": n,
        }
        print(f"  {name}: {timings[name]}", file=sys.stderr)

    # Band-bucket audit: same banding as q_minhash_lsh_pairs.
    spark.catalog.clearCache()
    sigs = _minhash_signatures(spark, sf_dir)
    band_keys = F.array(
        *[
            F.md5(
                F.concat(F.col(f"sig_{2 * b}"), F.col(f"sig_{2 * b + 1}"))
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )
    hist = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.expr("percentile(n, 0.5)").alias("p50"),
            F.expr("percentile(n, 0.99)").alias("p99"),
            F.sum(F.when(F.col("n") > MAX_BUCKET, 1).otherwise(0)).alias(
                "n_over_cap"
            ),
            F.sum(
                F.when(F.col("n") > MAX_BUCKET, F.col("n") * (F.col("n") - 1) / 2)
                .otherwise(0)
            )
            .cast("long")
            .alias("pairs_skipped_by_cap"),
        )
        .collect()[0]
        .asDict()
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_hashes": N_HASHES,
                "n_bands": N_BANDS,
                "max_bucket_cap": MAX_BUCKET,
                "timings": timings,
                "band_bucket_hist": hist,
            }
        )
    )


if __name__ == "__main__":
    main()
