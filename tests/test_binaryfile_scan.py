"""binaryFile -> decode end-to-end (round-9 verdict, Next #2): real
.png/.jpg/.mp4 FILES on disk, scanned with Spark's binaryFile source
(recursiveFileLookup + pathGlobFilter — the S1 mapping, reference
imaris_job.py:48-86), decoded through the from-spec codecs. Oracle
parity runs in tools/parity.py like every registered query; these tests
pin the parts the hash can't see: the glob actually excludes decoys,
and payload bytes never shuffle.
"""

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.queries import QUERIES
from aind_exaspim_data_transformation_spark.queries.multimodal_q import (
    N_BINFILES,
    binaryfile_fixture_dir,
)

from conftest import SF_SMALL


def test_binaryfile_scan_counts_and_formats(spark):
    df = QUERIES["q_multimodal_binaryfile_scan"](spark, SF_SMALL)
    rows = df.collect()
    assert len(rows) == N_BINFILES
    by_fmt = {}
    for r in rows:
        by_fmt[r["media_format"]] = by_fmt.get(r["media_format"], 0) + 1
    assert by_fmt == {"png": 20, "jpeg": 20, "mp4": 20}
    # every doc_id decoded exactly once, parsed back from its filename
    assert sorted(r["doc_id"] for r in rows) == list(range(N_BINFILES))


def test_path_glob_filter_excludes_decoys(spark):
    root = binaryfile_fixture_dir()
    all_files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
        .count()
    )
    media_only = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{png,jpg,mp4}")
        .option("recursiveFileLookup", "true")
        .load(root)
        .count()
    )
    # fixture = 60 media files + readme.txt + notes.dat + .complete
    # (binaryFile skips dotfiles as hidden), so the unfiltered scan sees
    # exactly two decoys more than the filtered one.
    assert media_only == N_BINFILES
    assert all_files == N_BINFILES + 2


def test_binaryfile_decode_plan_is_map_only(spark):
    """Payload bytes must never shuffle: scan -> mapInPandas, no
    Exchange anywhere in the physical plan."""
    df = QUERIES["q_multimodal_binaryfile_scan"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
