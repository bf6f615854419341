"""Seeded randomized differential tests: the round-5 closing transcript
window ops (sft_examples, truncation_audit, cache_economics) against
pure-Python brute-force references — zero-length turns planted densely
so ctx_start ties (the RANGE-peer edge class) are exercised every
round."""

from __future__ import annotations

import random

from e_commerce_lakehouse_spark.operators.transcripts import (
    cache_economics,
    sft_examples,
    truncation_audit,
)

ROLES = ["system", "user", "assistant", "tool"]


def _random_transcripts(seed: int):
    rng = random.Random(seed)
    rows = []
    for c in range(8):
        n = rng.randrange(1, 25)
        for i in range(n):
            # len 0 with probability ~1/3: ctx_start ties are the point
            ln = 0 if rng.random() < 0.34 else rng.randrange(1, 9)
            rows.append((f"c{c}", i, rng.choice(ROLES), "x" * ln))
    return rows


def _brute_sft(rows, budget):
    by_conv = {}
    for conv, idx, role, text in rows:
        by_conv.setdefault(conv, []).append((idx, role, len(text)))
    out = {}
    for conv, turns in by_conv.items():
        turns.sort()
        starts = []
        acc = 0
        for _, _, ln in turns:
            starts.append(acc)
            acc += ln
        for i, (idx, role, ln) in enumerate(turns):
            if role != "assistant":
                continue
            lo = starts[i] - budget
            ctx = [
                j for j in range(len(turns))
                if j != i and starts[j] >= lo and (
                    # prior turn within window, or a same-offset PRIOR peer;
                    # future turns are excluded even when starts tie
                    (j < i and starts[j] <= starts[i])
                )
            ]
            n_ctx = len(ctx)
            ctx_chars = sum(turns[j][2] for j in ctx)
            # window min(turn_idx) includes prior peers and the target
            in_window = [j for j in range(len(turns))
                         if lo <= starts[j] <= starts[i]]
            first = min(turns[j][0] for j in in_window) if n_ctx > 0 else idx
            out[(conv, idx)] = (first, n_ctx, ctx_chars, ln)
    return out


def test_sft_examples_matches_bruteforce(spark):
    for seed in (5, 29):
        rows = _random_transcripts(seed)
        budget = 12
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {
            (r["conv_id"], r["target_turn_idx"]): (
                r["first_ctx_turn"], r["n_ctx_turns"],
                r["ctx_chars"], r["target_chars"],
            )
            for r in sft_examples(df, budget_chars=budget).collect()
        }
        assert got == _brute_sft(rows, budget), f"seed {seed}"


def _brute_truncation(rows, budget):
    by_conv = {}
    for conv, idx, role, text in rows:
        by_conv.setdefault(conv, []).append((idx, len(text)))
    half = budget // 2
    out = {}
    for conv, turns in by_conv.items():
        turns.sort()
        lens = [ln for _, ln in turns]
        n = len(lens)
        fwd = [sum(lens[: i + 1]) for i in range(n)]
        rev = [sum(lens[i:]) for i in range(n)]
        head = [i for i in range(n) if fwd[i] <= budget]
        tail = [i for i in range(n) if rev[i] <= budget]
        mid = [i for i in range(n) if fwd[i] <= half or rev[i] <= half]
        out[conv] = (
            n, sum(lens),
            len(head), sum(lens[i] for i in head),
            len(tail), sum(lens[i] for i in tail),
            len(mid), sum(lens[i] for i in mid),
        )
    return out


def test_truncation_audit_matches_bruteforce(spark):
    for seed in (7, 41):
        rows = _random_transcripts(seed)
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {
            r["conv_id"]: (
                r["n_turns"], r["total_chars"],
                r["head_turns"], r["head_chars"],
                r["tail_turns"], r["tail_chars"],
                r["middrop_turns"], r["middrop_chars"],
            )
            for r in truncation_audit(df, budget_chars=20).collect()
        }
        assert got == _brute_truncation(rows, 20), f"seed {seed}"


def _brute_cache(rows):
    by_conv = {}
    for conv, idx, role, text in rows:
        by_conv.setdefault(conv, []).append((idx, role, len(text)))
    out = {}
    for conv, turns in by_conv.items():
        turns.sort()
        acc = 0
        billed = []
        for _, role, ln in turns:
            if role == "assistant":
                billed.append(acc + ln)
            acc += ln
        if billed:
            no = sum(billed)
            ca = max(billed)
            out[conv] = (len(billed), no, ca,
                         ((no - ca) * 1_000_000) // no if no > 0 else 0)
    return out


def test_cache_economics_matches_bruteforce(spark):
    for seed in (11, 53):
        rows = _random_transcripts(seed)
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {
            r["conv_id"]: (
                r["n_requests"], r["nocache_chars"],
                r["cache_chars"], r["saved_ppm"],
            )
            for r in cache_economics(df).collect()
        }
        assert got == _brute_cache(rows), f"seed {seed}"


def _brute_windows(rows, W, S):
    by_conv = {}
    for conv, idx, role, text in rows:
        by_conv.setdefault(conv, []).append((idx, len(text)))
    out = {}
    for conv, turns in by_conv.items():
        for idx, ln in sorted(turns):
            w = 0
            while True:
                start = w * S
                if start > idx:
                    break
                if idx < start + W:
                    key = (conv, w)
                    f, l, n, c = out.get(key, (idx, idx, 0, 0))
                    out[key] = (min(f, idx), max(l, idx), n + 1, c + ln)
                w += 1
    return out


def test_turn_windows_matches_bruteforce_incl_sparse_stride(spark):
    # stride > window_turns leaves GAP turns belonging to no window —
    # the F.sequence descending-range regression class (review finding)
    from e_commerce_lakehouse_spark.operators.transcripts import turn_windows

    for seed, (W, S) in [(3, (2, 4)), (9, (4, 2)), (21, (3, 3))]:
        rows = _random_transcripts(seed)
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {
            (r["conv_id"], r["window_id"]): (
                r["first_turn"], r["last_turn"], r["n_turns"], r["n_chars"]
            )
            for r in turn_windows(df, window_turns=W, stride=S).collect()
        }
        assert got == _brute_windows(rows, W, S), f"seed {seed} W{W} S{S}"
