"""Explicit schemas — the engine never uses inferSchema.

The reference re-infers types on every read (`inferSchema=true`,
`/root/reference/src/glue_jobs/orders_etl.py:81-83`), paying a double scan.
We pin explicit StructTypes (SURVEY.md §1.4).

TRANSCRIPTS_SCHEMA follows BASELINE.json ``input_hint``:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp). ``(conv_id, turn_idx)`` is the primary key; byte-equality
of ``text`` under (conv_id, turn_idx) ordering is the post-maintenance
invariant.

The reference's own table contracts (orders / products / order_items) are
pinned from its header contract (`src/lambda/file_processor.py:183-188`)
and typed unit tests (`tests/unit/test_glue_etl.py:24-31,108-113`).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Columns the table format keeps per-file min/max stats for (file skipping).
TRANSCRIPTS_STAT_COLUMNS = ("conv_id", "turn_idx", "ts")

# --- reference dataset contracts (SURVEY.md §1.2 / FIXTURES.md §2) ---

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("order_num", T.StringType(), True),
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("user_id", T.IntegerType(), True),
        T.StructField("order_timestamp", T.StringType(), True),
        T.StructField("total_amount", T.DoubleType(), True),
        T.StructField("date", T.StringType(), True),
    ]
)

PRODUCTS_SCHEMA = T.StructType(
    [
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("department_id", T.IntegerType(), True),
        T.StructField("department", T.StringType(), True),
        T.StructField("product_name", T.StringType(), True),
    ]
)

ORDER_ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), True),
        T.StructField("order_id", T.IntegerType(), True),
        T.StructField("user_id", T.IntegerType(), True),
        T.StructField("days_since_prior_order", T.IntegerType(), True),
        T.StructField("product_id", T.IntegerType(), True),
        T.StructField("add_to_cart_order", T.IntegerType(), True),
        T.StructField("reordered", T.IntegerType(), True),
        T.StructField("order_timestamp", T.StringType(), True),
        T.StructField("date", T.StringType(), True),
    ]
)
