"""Reference-parity ETL operators on the reference's own fixture shapes
(FIXTURES.md §2 planted-bad-row patterns; the reference's tests restate
logic inline — ours import the real operators, SURVEY.md §5)."""

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import etl
from e_commerce_lakehouse_spark.schema import ORDERS_SCHEMA, PRODUCTS_SCHEMA
from e_commerce_lakehouse_spark.sources.readers import SchemaContractError, read_csv

GOOD = ("ORD_001", 1, 100, "2024-01-01 10:00:00", 50.0, "2024-01-01")
DUP_LATER = ("ORD_001", 1, 100, "2024-01-02 10:00:00", 55.0, "2024-01-02")
NULL_NUM = (None, 2, 100, "2024-01-01 10:00:00", 10.0, "2024-01-01")
NEG_AMT = ("ORD_003", 3, 100, "2024-01-01 10:00:00", -5.0, "2024-01-01")
NULL_TS = ("ORD_004", 4, 100, None, 10.0, "2024-01-01")
TOO_BIG = ("ORD_005", 5, 100, "2024-01-01 10:00:00", 99_999.0, "2024-01-01")


def _orders(spark, rows):
    return spark.createDataFrame(rows, ORDERS_SCHEMA)


def test_orders_validation_split(spark):
    df = _orders(spark, [GOOD, NULL_NUM, NEG_AMT, NULL_TS, TOO_BIG])
    valid, invalid = etl.split_valid_invalid(df, etl.orders_valid_predicate())
    assert valid.count() == 1
    assert invalid.count() == 4  # duplicates/NULL-predicate rows all kept


def test_invalid_complement_keeps_duplicates_unlike_subtract(spark):
    # the reference's subtract() silently dedups invalid rows (P4)
    df = _orders(spark, [NEG_AMT, NEG_AMT])
    _, invalid = etl.split_valid_invalid(df, etl.orders_valid_predicate())
    assert invalid.count() == 2


def test_keep_latest_dedup_survives_later_amount(spark):
    # reference analog: tests/unit/test_orders_validation.py:46-73
    from e_commerce_lakehouse_spark.operators.merge import dedup_keep_latest

    df = _orders(spark, [GOOD, DUP_LATER]).withColumn(
        "order_timestamp", F.to_timestamp("order_timestamp")
    )
    out = dedup_keep_latest(df, ["order_id"], order_col="order_timestamp").collect()
    assert len(out) == 1
    assert out[0]["total_amount"] == 55.0


def test_transform_orders_derivations(spark):
    df = _orders(spark, [GOOD, TOO_BIG])
    t = etl.transform_orders(df)
    rows = {r["order_id"]: r for r in t.collect()}
    assert rows[1]["year"] == 2024 and rows[1]["month"] == 1 and rows[1]["hour"] == 10
    assert rows[1]["order_value_category"] == "Medium"
    assert rows[5]["order_value_category"] == "High"
    assert dict(t.dtypes)["order_timestamp"] == "timestamp"


def test_transform_products_and_validation(spark):
    rows = [(1, 1, " Electronics ", " Laptop "), (2, 2, "   ", "Ghost"), (3, None, "X", "Y")]
    df = spark.createDataFrame(rows, PRODUCTS_SCHEMA)
    valid, invalid = etl.split_valid_invalid(df, etl.products_valid_predicate())
    assert valid.count() == 1 and invalid.count() == 2
    t = etl.transform_products(valid).collect()[0]
    assert t["department_clean"] == "ELECTRONICS"
    assert t["product_name_clean"] == "Laptop"
    assert t["is_active"] is True


def test_union_align_schema_drift(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, 9.5)], "id int, b double")
    out = etl.union_align([a, b])
    assert set(out.columns) == {"id", "a", "b"}
    assert out.count() == 2


def test_csv_header_contract(spark, tmp_path):
    p = str(tmp_path / "orders.csv")
    with open(p, "w") as f:
        f.write("order_num,order_id,user_id,order_timestamp,total_amount,date\n")
        f.write("ORD_001,1,100,2024-01-01 10:00:00,50.0,2024-01-01\n")
    df = read_csv(spark, p, ORDERS_SCHEMA)
    assert df.count() == 1
    assert df.schema == ORDERS_SCHEMA

    bad = str(tmp_path / "bad.csv")
    with open(bad, "w") as f:
        f.write("order_num,order_id\nORD_001,1\n")
    try:
        read_csv(spark, bad, ORDERS_SCHEMA)
        raise AssertionError("expected SchemaContractError")
    except SchemaContractError as e:
        assert "user_id" in str(e)
