"""Source/sink format matrix: parquet is primary; json/csv/orc roundtrip."""

from __future__ import annotations

import pytest

from iceberg_table_generator_spark.datagen.records import orders


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, fmt):
    df = orders(spark, 500, seed=13)
    path = str(tmp_path / f"orders_{fmt}")
    writer = df.write.mode("overwrite")
    reader = spark.read
    if fmt == "csv":
        writer = writer.option("header", True)
        reader = reader.option("header", True).option("inferSchema", True)
    getattr(writer, fmt)(path)
    back = getattr(reader, fmt)(path)
    assert back.count() == 500
    # parquet/orc preserve types exactly; text formats at least the names
    assert set(back.columns) == set(df.columns)
    if fmt in ("parquet", "orc"):
        assert dict(back.dtypes) == dict(df.dtypes)
        a = {tuple(r) for r in df.collect()}
        b = {tuple(r) for r in back.collect()}
        assert a == b
