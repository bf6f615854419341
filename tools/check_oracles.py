"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and an
order-insensitive value hash (values normalized: floats rounded to 9 dp,
timestamps to ISO strings). Exit code 1 on any mismatch.

Usage: python tools/check_oracles.py [--sf-dir DIR] [--only q01,...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Arrow output types an oracle is allowed to emit. Anything else (decimal128
# from an uncast SUM(INT), float32, large lists, ...) hashes differently from
# the Spark side under the driver's Arrow-fetch comparison and must be cast
# in the oracle SQL (e.g. ``sum(x)::BIGINT``).
import re as _re

_ALLOWED_ARROW_TYPE = _re.compile(
    r"^(int8|int16|int32|int64|double|string|large_string|bool|null"
    r"|timestamp\[.*\]|date32\[day\])$"
)


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 9):.9f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return repr(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--bare", action="store_true",
                    help="use a DEFAULT-config SparkSession (driver-shaped) "
                         "instead of the repo's get_spark — catches "
                         "session-config-masked incompatibilities")
    args = ap.parse_args()

    import duckdb

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from e_commerce_lakehouse_spark.session import get_spark

    if args.bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[16]").getOrCreate()
    else:
        spark = get_spark(app_name="check_oracles", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(qs) if not args.only else args.only.split(",")
    failures = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(s_rows)} rows, {time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            # Fetch via Arrow, NOT fetchall(): the driver hashes Arrow-fetched
            # values, where DuckDB HUGEINT surfaces as decimal128 (→ Decimal)
            # while tuple-fetch coerces to Python int and masks the mismatch.
            tb = con.execute(oracles[name]).arrow()
            d_cols = tb.schema.names
            cols_py = [tb.column(i).to_pylist() for i in range(tb.num_columns)]
            d_rows = list(zip(*cols_py)) if cols_py else []
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:200]}")
            failures += 1
            continue
        problems = []
        bad_types = [
            (f.name, str(f.type))
            for f in tb.schema
            if not _ALLOWED_ARROW_TYPE.match(str(f.type))
        ]
        if bad_types:
            problems.append(f"oracle output type outside allowlist: {bad_types}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
            if hs != hd:
                problems.append(f"value-hash {hs} vs {hd}")
                # print a few differing lines to debug
                import itertools

                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(norm_cell(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(norm_cell(r[i]) for i in order_d) for r in d_rows}
                for x in itertools.islice(sorted(set_s - set_d), 3):
                    print(f"    spark-only: {x[:160]}")
                for x in itertools.islice(sorted(set_d - set_s), 3):
                    print(f"    duck-only:  {x[:160]}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    print(f"\n{len(names) - failures}/{len(names)} green")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
