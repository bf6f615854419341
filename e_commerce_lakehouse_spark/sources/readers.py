"""Ingestion sources (SURVEY.md §2.1 S1-S4).

- S1 CSV scan: explicit schema — the reference pays an inferSchema
  double-scan on every read (`orders_etl.py:81-83`); we never infer.
- S2/S3 Excel: no Spark-native Excel source exists; like the reference's
  Lambda (`s3_event_trigger.py:151-175`) we go through pandas —
  one DataFrame per non-empty sheet — then ``spark.createDataFrame``
  (Arrow path). Gated behind import-try: openpyxl may be absent.
- S4 fallback reader: on Excel parse failure retry as CSV
  (`orders_etl.py:102-112`).

Schema validation before read replaces the reference's header-peek lambda
(`file_processor.py:211-224`): we assert the parsed header set matches the
contract and fail fast with the missing columns named.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SchemaContractError(ValueError):
    """Raised when a file's header set violates the dataset contract."""


def _check_headers(actual: list[str], schema: T.StructType, source: str) -> None:
    expected = {f.name for f in schema.fields}
    missing = expected - set(actual)
    if missing:
        raise SchemaContractError(
            f"{source}: missing required columns {sorted(missing)}; got {actual}"
        )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    validate_header: bool = True,
) -> DataFrame:
    """S1: schema-pinned CSV scan (no inference, single pass)."""
    if validate_header and header:
        # peek first line only (reference reads 1KB: file_processor.py:171-180)
        first = spark.read.text(path).limit(1).collect()
        if first:
            _check_headers([c.strip() for c in first[0][0].split(",")], schema, path)
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet_name=None,
) -> list[tuple[str, DataFrame]]:
    """S2/S3: one (sheet_name, DataFrame) per non-empty sheet.

    Requires pandas' Excel engine (openpyxl); raises ImportError with a
    clear message when absent — the Spark-side plumbing is independent of
    the decoder."""
    import pandas as pd

    try:
        sheets = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError as e:  # openpyxl not installed in this image
        raise ImportError(
            "Excel ingestion needs openpyxl; convert to CSV upstream or "
            "install the engine"
        ) from e
    if not isinstance(sheets, dict):
        sheets = {"Sheet1": sheets}
    out = []
    for name, pdf in sheets.items():
        if pdf.empty:
            continue
        _check_headers(list(pdf.columns), schema, f"{path}#{name}")
        names = [f.name for f in schema.fields]
        out.append((name, spark.createDataFrame(pdf[names], schema=schema)))
    return out


def read_with_fallback(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S4: try Excel, fall back to CSV (orders_etl.py:102-112)."""
    if path.endswith((".xlsx", ".xls")):
        try:
            frames = [df for _n, df in read_excel(spark, path, schema)]
            if frames:
                from ..operators.etl import union_align

                return union_align(frames)
        except (ImportError, ValueError):
            pass
    return read_csv(spark, path, schema)
