"""Embeddings-shaped differential fuzz gate — fourth corpus, covering
the pairwise ANN/near-dup family on adversarial vectors.

Planted shapes: ZERO vectors (the zero-norm contract: similarity is
NULL — Spark guards the division because DuckDB's double x/0 is NULL,
not Inf/NaN), exact duplicates and scaled copies (cos == 1.0 ties →
neighbor-id tiebreaks), near-opposite vectors (cos == -1), tiny and
large magnitudes, and a NULL label. q53 (IVF) and q88 (SemDeDup) are
deliberately NOT in this gate: their cell-assignment step divides by
the vector norm inside an argmax, so a zero-norm vector's cell is an
engine-specific artifact — their contract (documented) is non-zero
vectors, enforced upstream by the quality gates; their sf0.01 oracle
rows remain their correctness anchor. q203 (ANN recall audit), q209/q212
(incremental IVF assignment / index lifecycle) and q213 (staleness)
are out for the same reason: every IVF leg inherits q53's non-zero
contract (q203's LSH and exact legs ARE covered here via q25/q26, and
ann_recall / ivf_assign_incremental carry closed-form unit tests in
tests/test_recall_and_preference.py).
"""

from __future__ import annotations

import importlib.util
import pathlib
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

_spec = importlib.util.spec_from_file_location(
    "check_oracles", REPO / "tools" / "check_oracles.py"
)
check_oracles = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracles)

FUZZ_QUERIES = [
    "q24_embedding_neardup",
    "q25_ann_topk",
    "q26_lsh_ann_topk",
    "q50_embedding_centroids",
    "q141_embedding_diversity",
    "q161_hard_negatives",
    "q198_kmeans_integer",
]

DIM = 64


def _vec(rng):
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def _corpus(seed: int):
    rng = random.Random(seed)
    vecs: list[list[float] | None] = []
    for i in range(28):
        vecs.append(_vec(rng))
    # queries are vec_id < 8 (q25's fixed predicate):
    vecs[3] = [0.0] * DIM          # zero-vector QUERY: every sim NULL
    vecs[5] = list(vecs[4])        # duplicate query pair
    # corpus-side adversaries:
    vecs.append([0.0] * DIM)                       # 28: zero vector
    vecs.append([0.0] * DIM)                       # 29: second zero vector
    vecs.append(list(vecs[1]))                     # 30: exact dup of a query
    vecs.append([x * 2.0 for x in vecs[1]])        # 31: scaled copy (cos 1)
    vecs.append([-x for x in vecs[2]])             # 32: opposite (cos -1)
    vecs.append([x * 1e-20 for x in vecs[6]])      # 33: tiny magnitude
    vecs.append([x * 1e6 for x in vecs[7]])        # 34: large magnitude
    vecs.append(_vec(rng))                         # 35
    labels = [(i % 5) if i % 9 else None for i in range(len(vecs))]
    return vecs, labels


@pytest.fixture(scope="module")
def fuzz_emb_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz_emb_sf")
    vecs, labels = _corpus(seed=31)
    ids = list(range(len(vecs)))
    # NULL adversaries: a NULL vec_id with a valid vector (must not
    # hijack a k-means seed slot / ANN identity), and a valid id with a
    # NULL embedding (must not void a centroid)
    ids += [None, len(vecs)]
    vecs += [[0.25] * DIM, None]
    labels += [1, 2]
    tb = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(tb, d / "embeddings.parquet")
    return str(d)


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_spark_matches_duckdb_on_fuzz_embeddings(spark, fuzz_emb_dir, name):
    import duckdb

    import e_commerce_lakehouse_spark.oracles as O
    import e_commerce_lakehouse_spark.queries as Q

    sdf = Q.ALL[name](spark, fuzz_emb_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{fuzz_emb_dir}/embeddings.parquet'"
    )
    tb = con.execute(O.ALL[name]).arrow()
    d_cols = tb.schema.names
    cols_py = [tb.column(i).to_pylist() for i in range(tb.num_columns)]
    d_rows = list(zip(*cols_py)) if cols_py else []

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    hs = check_oracles.value_hash(s_rows, s_cols)
    hd = check_oracles.value_hash(d_rows, d_cols)
    if hs != hd:
        order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        sl = sorted("|".join(check_oracles.norm_cell(r[i]) for i in order) for r in s_rows)
        dl = sorted("|".join(check_oracles.norm_cell(r[i]) for i in order) for r in d_rows)
        diff = [(a, b) for a, b in zip(sl, dl) if a != b][:4]
        pytest.fail(f"{name}: value-hash mismatch; first diffs: {diff}")
