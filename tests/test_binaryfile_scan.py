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


def test_permissive_decode_quarantines_corrupt_files(spark):
    """Poison-pill tolerance (round-10 verdict, Next #2): the corrupt
    tree has one malformed file per format; permissive mode yields an
    error row per bad file and decodes everything else — the job never
    aborts."""
    from aind_exaspim_data_transformation_spark.queries.multimodal_q import (
        _BINFILE_DECODE_SCHEMA,
        _binaryfile_scan,
        _binfile_decode_runner,
        binaryfile_corrupt_fixture_dir,
    )

    files = _binaryfile_scan(spark, binaryfile_corrupt_fixture_dir())
    rows = files.mapInPandas(
        _binfile_decode_runner(permissive=True), _BINFILE_DECODE_SCHEMA
    ).collect()
    good = [r for r in rows if r["error_stage"] is None]
    bad = {r["doc_id"]: r for r in rows if r["error_stage"] is not None}
    assert len(good) == N_BINFILES
    assert sorted(bad) == [60, 61, 62]
    assert all(r["error_stage"] == "decode" for r in bad.values())
    assert all(r["stat_sum"] is None for r in bad.values())
    # the error message names the decode failure, per format
    assert "truncated" in bad[60]["error_message"]
    assert "JpegError" in bad[61]["error_message"]
    assert "Mp4Error" in bad[62]["error_message"]
    assert {bad[60]["media_format"], bad[61]["media_format"],
            bad[62]["media_format"]} == {"png", "jpeg", "mp4"}


def test_strict_decode_fails_on_corrupt_tree(spark):
    """Contrast row: WITHOUT permissive mode the same tree fails the
    task (deterministic decode error — retries can't fix it)."""
    import pytest

    from aind_exaspim_data_transformation_spark.queries.multimodal_q import (
        _BINFILE_DECODE_SCHEMA,
        _binaryfile_scan,
        _binfile_decode_runner,
        binaryfile_corrupt_fixture_dir,
    )

    files = _binaryfile_scan(spark, binaryfile_corrupt_fixture_dir())
    df = files.mapInPandas(
        _binfile_decode_runner(permissive=False), _BINFILE_DECODE_SCHEMA
    )
    with pytest.raises(Exception, match="truncated|JpegError|Mp4Error"):
        df.collect()


def test_permissive_summary_plan_single_exchange(spark):
    """Decode stays map-only; the only shuffle is the tiny per-format
    summary aggregation (fixed-width rows, never payload bytes)."""
    df = QUERIES["q_multimodal_binaryfile_permissive"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
    assert "MapInPandas" in plan, plan
