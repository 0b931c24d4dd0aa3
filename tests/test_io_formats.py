"""Round-trip tests for the generic format surface (io.write_table /
io.read_table): schema + values survive parquet/orc exactly and csv/json
up to their text-format type envelope."""

import pytest

from pyspark.sql import functions as F

from nyc_taxi_data_engineering_project_spark import io

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def frame(spark):
    # nation: ints + strings — representable in every format's type system
    return spark.read.parquet(f"{SF}/nation.parquet").orderBy("n_nationkey")


def _rows(df):
    return [tuple(r) for r in df.orderBy("n_nationkey").collect()]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip(spark, frame, fmt, tmp_path):
    path = str(tmp_path / f"t_{fmt}")
    io.write_table(frame, path, fmt=fmt)
    back = io.read_table(spark, path, fmt=fmt)
    assert sorted(back.columns) == sorted(frame.columns)
    got = _rows(back.select(*frame.columns))
    assert got == _rows(frame)


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_self_describing_types_exact(spark, frame, fmt, tmp_path):
    path = str(tmp_path / f"s_{fmt}")
    io.write_table(frame, path, fmt=fmt)
    back = io.read_table(spark, path, fmt=fmt)
    assert dict(back.dtypes) == dict(frame.dtypes)


def test_text_formats_with_contract_schema(spark, frame, tmp_path):
    # csv + explicit schema: no inference pass, exact contract types
    path = str(tmp_path / "csv_schema")
    io.write_table(frame, path, fmt="csv")
    back = io.read_table(spark, path, fmt="csv", schema=frame.schema)
    assert back.schema == frame.schema


def test_partitioned_write_prunes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    io.write_table(docs, path, fmt="parquet", partition_by=["lang"])
    back = io.read_table(spark, path).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must prune at planning time, not post-scan
    assert "PartitionFilters" in plan
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_unknown_format_rejected(spark, frame, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        io.write_table(frame, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="unsupported format"):
        io.read_table(spark, str(tmp_path / "x"), fmt="xml")
