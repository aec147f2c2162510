"""Source-format interop (engine surface): the engine's tables are
parquet, but a drop-in user arrives with ORC and CSV — round-trip the
real test tables through both and prove values survive bit-for-bit
(types included, within each format's type system). CSV is the lossy
one: everything rides through strings, so the read-back pins the
schema-on-read contract (explicit schema, no inference drift)."""

from __future__ import annotations

import pyspark.sql.functions as F

from crawl_streams_spark.tables import load_table


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_orc_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == docs.schema
    cols = docs.columns
    assert _rows(back, cols) == _rows(docs, cols)


def test_orc_aggregate_equals_parquet(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_orc")
    li.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)

    def agg(df):
        return sorted(
            map(
                tuple,
                df.groupBy("l_returnflag")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("l_quantity").cast("decimal(28,4)")).alias("q"),
                )
                .collect(),
            )
        )

    assert agg(back) == agg(li)


def test_csv_roundtrip_with_explicit_schema(spark, sf_dir, tmp_path):
    """CSV survives only with schema-on-read: write the orders table,
    read it back with the ORIGINAL schema (no inference), and the values
    must match — including timestamps, the usual CSV casualty."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv")
    (
        orders.write.mode("overwrite")
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    back = (
        spark.read.schema(orders.schema)
        .option("header", True)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    cols = orders.columns
    assert _rows(back, cols) == _rows(orders, cols)


def test_csv_inference_drift_is_real(spark, sf_dir, tmp_path):
    """The negative control: schema INFERENCE on the same CSV produces a
    different schema than the source (the reason the contract above
    demands an explicit schema)."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_csv2")
    orders.write.mode("overwrite").option("header", True).csv(path)
    inferred = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    assert inferred.count() == orders.count()
    assert inferred.schema != orders.schema
