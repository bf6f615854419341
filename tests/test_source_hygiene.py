"""Source-hygiene gates that don't need Spark.

1. No module-level shadowed re-definitions anywhere in the package (a
   verbatim double-paste of ``length_outlier_filter`` shipped in round 4;
   this test makes that class of slip impossible to re-introduce).
2. Every oracle in ``__spark_entry__.oracle_sql()`` emits only
   Arrow types that hash identically to the Spark side under the driver's
   Arrow-fetch comparison (no decimal128 from an uncast ``SUM(INT)``,
   no float32, ...). Round 4's only red driver rows were exactly this.
"""

from __future__ import annotations

import ast
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "e_commerce_lakehouse_spark"

_ALLOWED_ARROW_TYPE = re.compile(
    r"^(int8|int16|int32|int64|double|string|large_string|bool|null"
    r"|timestamp\[.*\]|date32\[day\])$"
)


def test_no_shadowed_module_level_definitions():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        for node in tree.body:  # module level only — nested defs may repeat
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                if node.name in seen:
                    offenders.append(
                        f"{path.relative_to(PKG.parent)}:{node.lineno} "
                        f"re-defines {node.name!r} (first at :{seen[node.name]})"
                    )
                seen[node.name] = node.lineno
    assert not offenders, "shadowed re-definitions:\n" + "\n".join(offenders)


def test_oracle_output_types_in_allowlist(tmp_path):
    import sys

    import duckdb

    sys.path.insert(0, str(PKG.parent))
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        # LIMIT 0 via prepared relation would change semantics for some
        # queries; run at sf0.001 (tiny) and inspect only the schema.
        try:
            tb = con.execute(sql).arrow()
        except Exception as e:  # oracle must at least run on the tiny SF
            bad.append(f"{name}: oracle errored at sf0.001: {str(e)[:120]}")
            continue
        for f in tb.schema:
            if not _ALLOWED_ARROW_TYPE.match(str(f.type)):
                bad.append(f"{name}.{f.name}: {f.type}")
    assert not bad, "oracle output types outside allowlist:\n" + "\n".join(bad)
