"""Ingestion sources (SURVEY.md §2.1 S1-S4).

- S1 CSV scan: explicit schema — the reference pays an inferSchema
  double-scan on every read (`orders_etl.py:81-83`); we never infer.
- S2/S3 Excel: no Spark-native Excel source exists; the reference's
  Lambda goes through pandas+openpyxl (`s3_event_trigger.py:151-175`).
  Here xlsx is parsed with a self-contained stdlib reader (zipfile +
  xml.etree over ECMA-376 SpreadsheetML: sharedStrings, workbook rels,
  worksheet cell refs) — one DataFrame per non-empty sheet via
  ``spark.createDataFrame`` — so Excel ingestion has NO optional
  dependency. Date-styled numeric cells are surfaced as their raw serial
  numbers (callers convert; out of scope here).
- S4 fallback reader: on Excel parse failure retry as CSV
  (`orders_etl.py:102-112`).

Schema validation before read replaces the reference's header-peek lambda
(`file_processor.py:211-224`): we assert the parsed header set matches the
contract and fail fast with the missing columns named.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SSML = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKGREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


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


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column from an A1-style ref)."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_SSML}si"):
        # plain <t> or rich-text runs <r><t> — concatenate all text nodes
        out.append("".join(t.text or "" for t in si.iter(f"{_SSML}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(x.text or "" for x in c.iter(f"{_SSML}t"))
    v = c.find(f"{_SSML}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t in ("str",):  # formula cached string
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: int when integral, else float (date serials surface raw)
    f = float(v.text)
    return int(f) if f.is_integer() else f


def _sheet_rows(z: zipfile.ZipFile, part: str, shared: list[str]) -> list[list]:
    root = ET.fromstring(z.read(part))
    rows = []
    for row in root.iter(f"{_SSML}row"):
        vals: dict[int, object] = {}
        for c in row.iter(f"{_SSML}c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else len(vals)
            vals[ci] = _cell_value(c, shared)
        width = max(vals) + 1 if vals else 0
        rows.append([vals.get(i) for i in range(width)])
    return rows


def read_xlsx_stdlib(path: str) -> dict[str, tuple[list[str], list[list]]]:
    """Parse an xlsx with the stdlib only: {sheet_name: (header, rows)}.

    Implements the subset of ECMA-376 SpreadsheetML real exports use:
    shared/inline/formula-cached strings, booleans, numerics, sparse rows
    (placed by A1 cell ref). First row is the header."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = {
            r.get("Id"): r.get("Target").lstrip("/")
            for r in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")).iter(
                f"{_PKGREL}Relationship"
            )
        }
        out: dict[str, tuple[list[str], list[list]]] = {}
        for sh in wb.iter(f"{_SSML}sheet"):
            target = rels[sh.get(f"{_REL}id")]
            part = target if target.startswith("xl/") else f"xl/{target}"
            rows = _sheet_rows(z, part, shared)
            if not rows:
                continue
            header = [str(h) if h is not None else "" for h in rows[0]]
            body = [r + [None] * (len(header) - len(r)) for r in rows[1:]]
            out[sh.get("name")] = (header, [r[: len(header)] for r in body])
    return out


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet_name=None,
) -> list[tuple[str, DataFrame]]:
    """S2/S3: one (sheet_name, DataFrame) per non-empty sheet, parsed by
    the stdlib xlsx reader (no openpyxl needed). Cells arrive as parsed
    scalars; each column is cast to its contract type, mirroring the
    reference's per-sheet explode (`s3_event_trigger.py:151-175`)."""
    parsed = read_xlsx_stdlib(path)
    if sheet_name is not None and sheet_name not in parsed:
        raise ValueError(
            f"{path}: no sheet named {sheet_name!r} (found {sorted(parsed)})"
        )
    out = []
    for name, (header, rows) in parsed.items():
        if sheet_name is not None and name != sheet_name:
            continue
        if not rows:
            continue
        _check_headers(header, schema, f"{path}#{name}")
        raw = spark.createDataFrame(
            [[str(v) if v is not None else None for v in r] for r in rows],
            T.StructType([T.StructField(h, T.StringType()) for h in header]),
        )
        typed = raw.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields])
        out.append((name, typed))
    return out


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    reject_corrupt: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """JSONL scan with explicit schema (transcripts' usual wire format):
    returns (good, corrupt) — corrupt lines become audit rows (the
    rejected-rows pattern, `orders_etl.py:204-209`), never task failures.
    Never inferSchema: one pass, stable types.

    Lifetime note: the parsed batch is cached (Spark requires it to query
    the corrupt-record column); the cache lives until the caller's
    session ends or `good.unpersist()`-via-parent — for repeated large
    ingests, drain a batch then start the next rather than holding many."""
    extended = T.StructType(list(schema.fields) + [T.StructField("_corrupt", T.StringType())])
    df = (
        spark.read.schema(extended)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
        # Spark disallows queries that reference ONLY the corrupt-record
        # column of a raw JSON scan (SPARK-38053-documented behavior); the
        # documented remedy is caching the parsed batch before splitting
        .cache()
    )
    good = df.where(F.col("_corrupt").isNull()).drop("_corrupt").select(
        *[f.name for f in schema.fields]
    )
    corrupt = df.where(F.col("_corrupt").isNotNull()).select(
        F.col("_corrupt").alias("raw_line")
    )
    return good, corrupt


def read_with_fallback(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S4: try Excel, fall back to CSV (orders_etl.py:102-112)."""
    if path.endswith((".xlsx", ".xls")):
        try:
            frames = [df for _n, df in read_excel(spark, path, schema)]
            if frames:
                from ..operators.etl import union_align

                return union_align(frames)
        except (ValueError, KeyError, ET.ParseError, zipfile.BadZipFile):
            # not a parseable xlsx (mislabeled CSV, truncated upload, or
            # malformed parts) — reference behavior: retry as CSV
            pass
    return read_csv(spark, path, schema)
