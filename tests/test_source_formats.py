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


def test_events_ts_normalizes_across_encodings(spark, tmp_path):
    """events.parquet `ts` has shipped as TIMESTAMP(NANOS) and as
    TIMESTAMP(MICROS) isAdjustedToUTC=false. load_table must surface
    TIMESTAMP with identical values for both — the micros form at the
    SCAN (inferTimestampNTZ=false, no projection), the nanos form via
    the nanosAsLong long read + truncating division."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from aind_exaspim_data_transformation_spark.sources.tables import (
        load_table,
    )

    base = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    stamps = [base + datetime.timedelta(seconds=i) for i in range(10)]
    cols = {
        "user_id": pa.array(range(10), pa.int64()),
        "event_type": pa.array(["click"] * 10),
        "value": pa.array([float(i) for i in range(10)]),
        "props": pa.array(["{}"] * 10),
    }
    nanos_dir = tmp_path / "nanos"
    micros_dir = tmp_path / "micros"
    for d, unit in [(nanos_dir, "ns"), (micros_dir, "us")]:
        d.mkdir()
        table = pa.table(
            {"ts": pa.array(stamps, pa.timestamp(unit)), **cols}
        )
        pq.write_table(table, str(d / "events.parquet"))

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for label, d in [("nanos", nanos_dir), ("micros", micros_dir)]:
        df = load_table(spark, str(d), "events")
        assert dict(df.dtypes)["ts"] == "timestamp", label
        out[label] = sorted(
            r["s"]
            for r in df.select(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("s")
            ).collect()
        )
    assert out["nanos"] == out["micros"]
    assert out["micros"][0] == "2024-01-01 12:00:00.123456"


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    # ORC: the second columnar lake format Spark ships natively. The
    # round trip must be value-exact and the filter must reach the ORC
    # scan as a search argument (with column pruning), mirroring the
    # parquet pushdown assertions in test_plans.py.
    path = str(tmp_path / "orders_orc")
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orders.collect())
    )
    plan = (
        back.where(F.col("o_totalprice") > 1000.0)
        .select("o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_totalprice)" in plan
    assert "o_orderstatus" not in plan.split("ReadSchema")[1][:200]
