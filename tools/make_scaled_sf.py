"""Build a K-times scaled copy of an sf dir for SCALE-HOLDOUT perf runs.

The driver's round-end measurement may use a larger generated scale
factor than the local sf0.1, so optimizations must hold beyond 600k-row
inputs (optimization guide: config tuned only to small tables may not
scale). This tool fabricates a K× dataset in the SAME distributions as
the driver's generator output so the timed queries can be re-run for
per-row scaling shape (NOT for oracle correctness — the fabricated
replicas have no DuckDB twin):

- orders/lineitem: K replicas with o_orderkey/l_orderkey offset by the
  orders keyspace (joins stay consistent, fan-out per key unchanged);
- events: K replicas with event_id AND user_id offset (K× users at the
  original per-user volume — a bigger corpus, not denser sessions);
- documents: replica 0 is the original; replicas sample words from the
  empirical vocabulary with empirical length/lang/source distributions
  and the original's exact-dup planting rate, so shingle/LSH collision
  density stays representative instead of exploding (naive text
  replication gives every doc K-1 exact twins -> K^2 candidate pairs,
  which no real corpus growth produces);
- embeddings: replicas perturb each dimension by a small deterministic
  factor (cluster structure preserved, vectors distinct);
- dims (region/nation/customer/supplier/part): copied as-is.

Usage: python tools/make_scaled_sf.py [--k 5] [--src /root/testdata/sf0.1]
           [--out /dev/shm/sf_scaled]
Deterministic (seeded); pure pyarrow, no Spark session.
"""

from __future__ import annotations

import argparse
import collections
import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"),
                   compression="snappy")


def _offset_col(t: pa.Table, col: str, off: int) -> pa.Table:
    import pyarrow.compute as pc
    i = t.schema.get_field_index(col)
    return t.set_column(i, t.schema.field(i),
                        pc.add(t.column(col), pa.scalar(off, t.schema.field(i).type)))


def _replicate(t: pa.Table, k: int, key_offsets: dict[str, int]) -> pa.Table:
    parts = [t]
    for i in range(1, k):
        r = t
        for col, span in key_offsets.items():
            r = _offset_col(r, col, span * i)
        parts.append(r)
    return pa.concat_tables(parts)


def _scaled_documents(src: str, k: int, seed: int = 1234) -> pa.Table:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    rows = t.to_pylist()
    vocab, words_total = collections.Counter(), 0
    lens, langs, sources = [], collections.Counter(), collections.Counter()
    for r in rows:
        ws = r["text"].split()
        vocab.update(ws)
        words_total += len(ws)
        lens.append(len(ws))
        langs[r["lang"]] += 1
        sources[r["source"]] += 1
    vws, vwt = list(vocab.keys()), list(vocab.values())
    lks, lwt = list(langs.keys()), list(langs.values())
    sks, swt = list(sources.keys()), list(sources.values())
    dup_rate = 1.0 - len({r["text"] for r in rows}) / len(rows)
    rng = random.Random(seed)
    n = len(rows)
    out = list(rows)
    recent: list[str] = []
    for i in range(1, k):
        for j in range(n):
            if recent and rng.random() < dup_rate:
                text = rng.choice(recent)  # planted exact dup, same rate
            else:
                text = " ".join(
                    rng.choices(vws, weights=vwt, k=rng.choice(lens)))
            recent.append(text)
            if len(recent) > 200:
                recent.pop(0)
            out.append({
                "doc_id": n * i + j,
                "text": text,
                "lang": rng.choices(lks, weights=lwt, k=1)[0],
                "source": rng.choices(sks, weights=swt, k=1)[0],
                "n_chars": len(text),
            })
    return pa.Table.from_pylist(out, schema=t.schema)


def _scaled_embeddings(src: str, k: int, seed: int = 4321) -> pa.Table:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    rows = t.to_pylist()
    rng = random.Random(seed)
    n = len(rows)
    out = list(rows)
    for i in range(1, k):
        for j, r in enumerate(rows):
            out.append({
                "vec_id": n * i + j,
                "embedding": [v * (1.0 + rng.uniform(-0.02, 0.02))
                              for v in r["embedding"]],
                "label": r["label"],
            })
    return pa.Table.from_pylist(out, schema=t.schema)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/dev/shm/sf_scaled")
    args = ap.parse_args()
    shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out)

    orders = pq.read_table(os.path.join(args.src, "orders.parquet"))
    okeys = orders.num_rows  # keyspace span == row count (0-based dense)
    _write(args.out, "orders", _replicate(orders, args.k,
                                          {"o_orderkey": okeys}))
    li = pq.read_table(os.path.join(args.src, "lineitem.parquet"))
    _write(args.out, "lineitem", _replicate(li, args.k,
                                            {"l_orderkey": okeys}))
    ev = pq.read_table(os.path.join(args.src, "events.parquet"))
    import pyarrow.compute as pc
    uspan = pc.max(ev.column("user_id")).as_py() + 1
    _write(args.out, "events", _replicate(
        ev, args.k, {"event_id": ev.num_rows, "user_id": uspan}))
    _write(args.out, "documents", _scaled_documents(args.src, args.k))
    _write(args.out, "embeddings", _scaled_embeddings(args.src, args.k))
    for dim in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(os.path.join(args.src, f"{dim}.parquet"),
                    os.path.join(args.out, f"{dim}.parquet"))
    for name in ("orders", "lineitem", "events", "documents", "embeddings"):
        print(name, pq.read_metadata(
            os.path.join(args.out, f"{name}.parquet")).num_rows)


if __name__ == "__main__":
    main()
