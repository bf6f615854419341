"""Per-file bloom filters for point-lookup file skipping — IMPORT-LIGHT.

Delta's bloom-filter index / Iceberg's puffin blobs, re-expressed for
this table format: each data file can carry a small bloom over the
DISTINCT values of a declared column (metadata/bloom.json, see
``Table.set_bloom_columns``). Min/max stats prune files whose key RANGE
misses the predicate — useless on append-vintage files that each span
nearly the whole key space; the bloom prunes by MEMBERSHIP, which is
exactly what a ``conv_id = 'x'`` point lookup needs before clustering
has localized the key.

Determinism contract: md5 double hashing (Kirsch-Mitzenmacker), bit i =
(h1 + i*h2) mod m — no Python ``hash()`` (seeded per process), no
engine-specific hash, so a bloom written by any session/executor tests
identically everywhere.

Scale shape: blooms live in the manifest as a separate parquet column
(``bloom_<col>``) that the planner NEVER reads for range pruning — the
vectorized stat scan selects only stat columns, and bloom refinement
does a second read of (path, bloom_<col>) filtered to the min/max
survivors, so row groups full of pruned files are skipped by the path
predicate. Sizing: m = -ndv*ln(fpp)/ln(2)^2 bits (default fpp 1%),
capped at ``max_bits`` — past the cap the filter stays CORRECT (no
false negatives, fpp degrades gracefully).

This module is imported inside executor tasks (compaction's Arrow wave,
distributed stat collection): stdlib only.
"""

from __future__ import annotations

import base64
import hashlib
import math
from typing import Iterable

DEFAULT_FPP = 0.01
DEFAULT_MAX_BITS = 1 << 19  # 64 KiB per file — a 128 MB data file's ~50k
#                             distinct convs fit at ~1% fpp


def _hash_pair(value: str) -> tuple[int, int]:
    d = hashlib.md5(value.encode("utf-8")).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1  # odd: full-period stride
    return h1, h2


def build_bloom(
    values: Iterable[str],
    fpp: float = DEFAULT_FPP,
    max_bits: int = DEFAULT_MAX_BITS,
) -> dict:
    """Bloom dict {"m", "k", "ndv", "b64"} over DISTINCT ``values``.

    Values are hashed as utf-8 strings (the one bloom column here,
    conv_id, is a string; non-strings would need a declared canonical
    form on both write and probe sides)."""
    vals = set(values)
    n = max(1, len(vals))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    # cap first ROUNDED DOWN to a 64-bit multiple: a caller-supplied cap
    # like 1001 must never leave bit positions past the bytearray's end
    cap = max(64, (int(max_bits) // 64) * 64)
    m = min(max(64, ((m + 63) // 64) * 64), cap)
    k = max(1, min(16, round(m / n * math.log(2))))
    bits = bytearray(m // 8)
    for v in vals:
        h1, h2 = _hash_pair(v)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return {
        "m": m,
        "k": k,
        "ndv": len(vals),
        "b64": base64.b64encode(bytes(bits)).decode("ascii"),
    }


def build_bloom_from_values(values, params: dict | None = None) -> dict:
    """THE canonicalization contract, shared by every builder
    (_footer_stats footer pass, compact's in-memory Arrow wave): non-null
    values hashed as str(value), sizing params filtered to the supported
    keys. scan._bloom_probe_value mirrors the str() form on the probe
    side — change them together."""
    return build_bloom(
        (str(v) for v in values if v is not None),
        **{k: v for k, v in (params or {}).items() if k in ("fpp", "max_bits")},
    )


def bloom_contains(bloom: dict, value: str) -> bool:
    """Membership probe: False = DEFINITELY absent (safe to skip the
    file); True = maybe present (keep). A malformed/missing bloom must
    be treated as "keep" by callers — never call this to decide keep
    with a None bloom."""
    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["b64"])
    h1, h2 = _hash_pair(value)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not bits[pos >> 3] & (1 << (pos & 7)):
            return False
    return True
