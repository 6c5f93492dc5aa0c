"""Source-format coverage (§2B sources row): CSV and JSON-lines round
trips, binaryFile scans — every format the engine declares beyond the
parquet used everywhere else."""

from pyspark.sql import functions as F

from aind_exaspim_data_transformation_spark.sources.tables import load_table

from conftest import SF_SMALL


def test_csv_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "nation_csv")
    nation = load_table(spark, SF_SMALL, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(path)
    back = (
        spark.read.option("header", "true")
        .schema("n_nationkey int, n_name string, n_regionkey int")
        .csv(path)
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_json_lines_roundtrip(spark, tmp_path):
    path = str(tmp_path / "region_json")
    region = load_table(spark, SF_SMALL, "region")
    region.write.mode("overwrite").json(path)
    back = spark.read.json(path).select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, region.collect())
    )


def test_binary_file_scan(spark, tmp_path):
    # binaryFile: opaque payload ingestion with path metadata — the
    # entry point for raw media/tile files into the block model.
    payloads = {f"blob_{i}.bin": bytes([i]) * (10 + i) for i in range(3)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(tmp_path))
        .select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            "length",
            "content",
        )
    )
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert rows[name]["length"] == len(data)
        assert bytes(rows[name]["content"]) == data
