"""Reference-parity ETL dataflow operators (SURVEY.md §2.2-§2.7).

Every dataflow operator the reference's three Glue jobs execute,
re-expressed as composable DataFrame functions — imported by tests and by
``__spark_entry__.queries()`` (the reference's tests restate logic inline
instead of importing it; SURVEY.md §5 calls that out as a weakness we fix).

Operator map (reference file:line → function here):
- P1 orders validation (orders_etl.py:134-144)        → validate_orders
- P2 products validation (products_etl.py:54-63)      → validate_products
- P3 order_items validation (order_items_etl.py:43-54)→ validate_order_items
- P4 invalid complement (orders_etl.py:145)           → split_valid_invalid
  (negated predicate — NOT the reference's ``subtract``, which silently
  dedups invalid rows and costs two extra shuffles)
- W1 keep-latest window dedup (orders_etl.py:150-160) → merge.dedup_keep_latest
- O2 schema-aligned union (orders_etl.py:118-129)     → union_align
- O4 dropDuplicates by key (order_items_etl.py:59-61) → dedup_first_seen
- scalar transforms (orders_etl.py:162-174,
  products_etl.py:66-74, order_items_etl.py:63-70)    → transform_*
- A3/A4/A5 documented analytics (README.md:213-237)   → expressed in
  __spark_entry__ queries q_category_stats / q_dept_counts / q_join_agg
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- validation


def orders_valid_predicate(
    amount_cap: float = 50_000.0,
    order_key: str = "order_id",
    user_key: str = "user_id",
    ts_col: str = "order_timestamp",
    amount_col: str = "total_amount",
    num_col: str | None = "order_num",
) -> Column:
    """The reference's 9-term conjunctive filter (orders_etl.py:134-144):
    ids not-null and > 0, amount in (0, cap], timestamp parseable."""
    p = (
        F.col(order_key).isNotNull()
        & (F.col(order_key) > 0)
        & F.col(user_key).isNotNull()
        & (F.col(user_key) > 0)
        & F.col(amount_col).isNotNull()
        & (F.col(amount_col) > 0)
        & (F.col(amount_col) <= amount_cap)
        & F.col(ts_col).isNotNull()
        # parseability (orders_etl.py:139): a non-null string that fails
        # to_timestamp is invalid; on an already-timestamp column this
        # reduces to the isNotNull above (to_timestamp is identity there)
        & F.to_timestamp(F.col(ts_col)).isNotNull()
    )
    if num_col is not None:
        p = p & F.col(num_col).isNotNull()
    return p


def products_valid_predicate(
    id_col: str = "product_id",
    dept_id_col: str = "department_id",
    dept_col: str = "department",
    name_col: str = "product_name",
) -> Column:
    """products_etl.py:54-63: ids positive, strings non-blank after trim."""
    return (
        F.col(id_col).isNotNull()
        & (F.col(id_col) > 0)
        & F.col(dept_id_col).isNotNull()
        & (F.col(dept_id_col) > 0)
        & F.col(dept_col).isNotNull()
        & (F.length(F.trim(F.col(dept_col))) > 0)
        & F.col(name_col).isNotNull()
        & (F.length(F.trim(F.col(name_col))) > 0)
    )


def order_items_valid_predicate(
    id_col: str = "id",
    order_col: str = "order_id",
    user_col: str = "user_id",
    product_col: str = "product_id",
    cart_col: str = "add_to_cart_order",
    reorder_col: str = "reordered",
) -> Column:
    """order_items_etl.py:43-54: isin / between / positive-id checks."""
    return (
        F.col(id_col).isNotNull()
        & (F.col(id_col) > 0)
        & F.col(order_col).isNotNull()
        & (F.col(order_col) > 0)
        & F.col(user_col).isNotNull()
        & F.col(product_col).isNotNull()
        & (F.col(product_col) > 0)
        & F.col(cart_col).isNotNull()
        & F.col(cart_col).between(1, 50)
        & F.col(reorder_col).isin(0, 1)
    )


def split_valid_invalid(df: DataFrame, predicate: Column) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) in ONE pass each via predicate negation.

    The reference computes ``invalid = df.subtract(valid)``
    (orders_etl.py:145) — an EXCEPT DISTINCT that silently deduplicates
    invalid rows and shuffles twice. Negating the predicate is shuffle-free
    and keeps duplicates.

    The VALID side uses the bare predicate (already null-safe: WHERE drops
    null evaluations) so every conjunct pushes down to the parquet scan;
    only the INVALID complement needs the ``~coalesce(p, false)`` wrapper
    to classify null-predicate rows as invalid."""
    return df.where(predicate), df.where(~F.coalesce(predicate, F.lit(False)))


def with_rejection_audit(invalid: DataFrame, reason: str, job_run_id: str) -> DataFrame:
    """S8 rejected-rows audit columns (orders_etl.py:204-209)."""
    return (
        invalid.withColumn("rejection_reason", F.lit(reason))
        .withColumn("rejection_timestamp", F.current_timestamp())
        .withColumn("job_run_id", F.lit(job_run_id))
    )


def write_rejected(invalid: DataFrame, dest_dir: str, reason: str, job_run_id: str) -> None:
    """S8 parquet-append rejected-rows sink (orders_etl.py:204-209): the
    audit trail survives across job runs via append mode."""
    with_rejection_audit(invalid, reason, job_run_id).write.mode("append").parquet(dest_dir)


# ---------------------------------------------------------------- transforms


def bucketize(col: Column, bounds: list[float], labels: list[str]) -> Column:
    """3-way when/otherwise bucketing generalized (orders_etl.py:171-174:
    <50 Low, <200 Medium, else High)."""
    assert len(labels) == len(bounds) + 1
    expr = None
    for b, lab in zip(bounds, labels):
        expr = F.when(col < b, lab) if expr is None else expr.when(col < b, lab)
    return expr.otherwise(labels[-1])


def transform_orders(df: DataFrame, ts_col: str = "order_timestamp") -> DataFrame:
    """orders_etl.py:162-174: type coercions + date parts + value bucket.
    (processing_timestamp is parameterized out of tests for determinism).

    Partition-part parity: the reference derives year/month/day from the
    separate ``date`` column (orders_etl.py:166-169), not the timestamp —
    when ``date`` is present we do the same (they can disagree when an
    order's date differs from its timestamp's date); ``hour`` always comes
    from the timestamp (the date has none)."""
    t = F.to_timestamp(F.col(ts_col))
    d = F.to_date(F.col("date")) if "date" in df.columns else t
    out = (
        df.withColumn(ts_col, t)
        .withColumn("year", F.year(d))
        .withColumn("month", F.month(d))
        .withColumn("day", F.dayofmonth(d))
        .withColumn("hour", F.hour(t))
        .withColumn(
            "order_value_category",
            bucketize(F.col("total_amount"), [50.0, 200.0], ["Low", "Medium", "High"]),
        )
    )
    if "date" in df.columns:  # orders_etl.py:165: date string → DateType
        out = out.withColumn("date", F.to_date(F.col("date")))
    return out


def transform_products(df: DataFrame) -> DataFrame:
    """products_etl.py:66-74: trimmed/uppercased clean columns."""
    return (
        df.withColumn("department_clean", F.upper(F.trim(F.col("department"))))
        .withColumn("product_name_clean", F.trim(F.col("product_name")))
        .withColumn("is_active", F.lit(True))
    )


def transform_order_items(df: DataFrame, ts_col: str = "order_timestamp") -> DataFrame:
    """order_items_etl.py:63-70."""
    t = F.to_timestamp(F.col(ts_col))
    return (
        df.withColumn(ts_col, t)
        .withColumn("year", F.year(t))
        .withColumn("month", F.month(t))
        .withColumn("is_reorder", F.col("reordered").cast("boolean"))
    )


# ---------------------------------------------------------------- set ops


def union_align(dfs: list[DataFrame]) -> DataFrame:
    """O2: multi-file union that survives schema drift
    (orders_etl.py:118-129 hand-rolls common-column projection; Spark has
    it built in)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def dedup_first_seen(df: DataFrame, keys: list[str]) -> DataFrame:
    """O4: dropDuplicates-by-key (order_items_etl.py:59-61). Arbitrary
    winner, unlike merge.dedup_keep_latest — kept for parity, prefer the
    deterministic one."""
    return df.dropDuplicates(keys)
