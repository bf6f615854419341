"""Round-5 additions: SCD2 family, blocked fuzzy matching, exact linear
stats, mixture drift. Each test pins the operator semantics on a
hand-built frame (the sf0.01 oracle gate covers the testdata scale)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.curation import mixture_drift
from e_commerce_lakehouse_spark.operators.fuzzy import blocked_levenshtein_pairs
from e_commerce_lakehouse_spark.operators.scd import (
    scd2_apply,
    scd2_build,
    scd2_point_in_time,
)
from e_commerce_lakehouse_spark.operators.stats import exact_linear_stats

from tests.conftest import assert_same_rows

_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_scd2_build_collapses_consecutive_duplicates(spark):
    rows = [
        (1, _ts(1), 10, "a"),
        (1, _ts(2), 11, "a"),  # duplicate run -> no new version
        (1, _ts(3), 12, "b"),
        (1, _ts(4), 13, "a"),  # back to 'a' IS a change
        (2, _ts(1), 20, "x"),
    ]
    out = scd2_build(_events(spark, rows), "user_id", "ts", "event_id", "event_type")
    got = {
        (r.user_id, r.version): (r.state, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got[(1, 1)] == ("a", _ts(1), _ts(3), False)
    assert got[(1, 2)] == ("b", _ts(3), _ts(4), False)
    assert got[(1, 3)] == ("a", _ts(4), None, True)
    assert got[(2, 1)] == ("x", _ts(1), None, True)
    assert len(got) == 4
    # lineage: version 1 of user 1 opened with event 10 (11 collapsed away)
    ids = {(r.user_id, r.version): r.change_event_id for r in out.collect()}
    assert ids[(1, 1)] == 10


def test_scd2_build_null_state_and_tiebreak(spark):
    rows = [
        (1, _ts(1), 2, "a"),  # same ts: event_id orders 1 before 2? no — 2 > 1
        (1, _ts(1), 1, None),  # NULL state sorts first by event_id
        (1, _ts(2), 3, None),  # NULL == NULL null-safely -> would collapse
    ]
    out = scd2_build(_events(spark, rows), "user_id", "ts", "event_id", "event_type")
    rs = sorted(out.collect(), key=lambda r: r.version)
    assert [r.state for r in rs] == [None, "a", None]
    assert [r.change_event_id for r in rs] == [1, 2, 3]


def test_scd2_point_in_time_intervals(spark):
    dim = scd2_build(
        _events(spark, [(1, _ts(2), 10, "a"), (1, _ts(4), 11, "b")]),
        "user_id", "ts", "event_id", "event_type",
    )
    probes = spark.createDataFrame(
        [(100, 1, _ts(1)), (101, 1, _ts(3)), (102, 1, _ts(4)), (103, 1, _ts(9))],
        "event_id long, user_id long, ts timestamp",
    )
    out = {r.event_id: (r.state, r.version) for r in
           scd2_point_in_time(dim, probes, "user_id", "ts").collect()}
    assert out[100] == (None, None)  # before first version
    assert out[101] == ("a", 1)      # inside [2, 4)
    assert out[102] == ("b", 2)      # boundary: valid_from inclusive
    assert out[103] == ("b", 2)      # open version


def test_scd2_apply_equals_full_rebuild_and_passes_through(spark):
    old = [
        (1, _ts(1), 1, "a"), (1, _ts(2), 2, "b"), (1, _ts(3), 3, "b"),
        (2, _ts(1), 4, "x"),
        (3, _ts(2), 5, "q"),
    ]
    new = [
        (1, _ts(5), 6, "b"),  # same as current state -> collapses, no version
        (1, _ts(6), 7, "c"),
        (3, _ts(7), 8, "r"),
    ]
    dim = scd2_build(_events(spark, old), "user_id", "ts", "event_id", "event_type")
    inc = scd2_apply(
        dim, _events(spark, new), "user_id", "ts", "event_id", "event_type"
    )
    full = scd2_build(
        _events(spark, old + new), "user_id", "ts", "event_id", "event_type"
    )
    assert_same_rows(inc, full)
    # untouched key 2 still has exactly its original row
    assert inc.where("user_id = 2").count() == 1


def test_blocked_levenshtein_pairs_blocks_and_threshold(spark):
    df = spark.createDataFrame(
        [(1, "red bolt"), (2, "red bolt"), (3, "bed bolt"),
         (4, "red ring"), (5, "zzz bolt")],
        "k long, name string",
    )
    out = blocked_levenshtein_pairs(
        df, "name", "k", F.element_at(F.split(F.col("name"), " "), -1), max_dist=2
    ).collect()
    pairs = {(r.name_a, r.name_b): (r.dist, r.n_a, r.n_b) for r in out}
    # cross-block pair (red bolt, red ring) must NOT appear even at dist 2;
    # zzz bolt shares the block but exceeds the threshold
    assert set(pairs) == {("bed bolt", "red bolt")}
    assert pairs[("bed bolt", "red bolt")] == (1, 1, 2)  # counts aggregated


def test_exact_linear_stats_matches_closed_form(spark):
    # y = 3x + noise-free 2 -> slope 3, corr 1
    rows = [("g", x, 3 * x + 2) for x in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = exact_linear_stats(df, "grp", F.col("x"), F.col("y")).collect()[0]
    assert r.n == 5
    assert r.mean_x == 3.0 and r.mean_y == 11.0
    assert r.slope_yx == 3.0 and r.corr_xy == 1.0
    assert r.covar_xy == 7.5  # sample covariance of (1..5, 5..17)


def test_mixture_drift_known_kl_and_null_bucket(spark):
    # corpus: 8 docs -> p(en)=0.5, p(de)=0.25, p(null)=0.25
    rows = (
        [("s1", "en")] * 2 + [("s1", "de")] * 2
        + [("s2", "en")] * 2 + [("s2", None)] * 2
    )
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r.source: r for r in mixture_drift(df, "source", "lang").collect()}
    # s1: 0.5*ln(0.5/0.5) + 0.5*ln(0.5/0.25) = 0.5*ln 2
    assert out["s1"].kl_nats == round(0.5 * math.log(2), 6)
    assert out["s2"].kl_nats == round(0.5 * math.log(2), 6)
    assert out["s1"].n_docs == 4 and out["s1"].n_cats == 2


def test_scd2_apply_null_key_is_a_real_key(spark):
    # review finding: non-null-safe semi/anti joins neither retired nor
    # replayed the NULL-key history -> duplicate version-1 open rows
    old = [(None, _ts(1), 1, "a"), (2, _ts(1), 2, "x")]
    new = [(None, _ts(2), 3, "b")]
    dim = scd2_build(_events(spark, old), "user_id", "ts", "event_id", "event_type")
    inc = scd2_apply(
        dim, _events(spark, new), "user_id", "ts", "event_id", "event_type"
    )
    full = scd2_build(
        _events(spark, old + new), "user_id", "ts", "event_id", "event_type"
    )
    assert_same_rows(inc, full)
    nulls = sorted(
        inc.where(F.col("user_id").isNull()).collect(), key=lambda r: r.version
    )
    assert [(r.version, r.state, r.is_current) for r in nulls] == [
        (1, "a", False), (2, "b", True),
    ]


def test_mixture_drift_null_group_is_a_real_group(spark):
    rows = [("s1", "en")] * 2 + [(None, "en"), (None, "de")]
    df = spark.createDataFrame(rows, "source string, lang string")
    out = {r.source: r for r in mixture_drift(df, "source", "lang").collect()}
    assert set(out) == {"s1", "__null__"}
    assert out["__null__"].n_docs == 2 and out["__null__"].n_cats == 2
    # corpus totals include the null group's docs: p(en)=3/4, p(de)=1/4
    assert out["s1"].kl_nats == round(math.log(4 / 3), 6)


def test_exact_linear_stats_pairwise_complete(spark):
    rows = [("g", 1, 5), ("g", 2, 8), ("g", 3, 11), ("g", None, 999), ("g", 7, None)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = exact_linear_stats(df, "grp", F.col("x"), F.col("y")).collect()[0]
    # NULL-x and NULL-y rows are excluded from n AND every moment
    assert r.n == 3
    assert r.mean_x == 2.0 and r.mean_y == 8.0 and r.slope_yx == 3.0


def test_distributed_cumsum_preserves_rows_on_clustered_keys(spark):
    # sf0.1 sweep finding: the totals job and the row-side join evaluated
    # the range exchange independently; differing sampled boundaries made
    # the _pmin join drop whole partitions (q108 returned ~6-12% of its
    # rows, varying run to run). Tight key clusters + many partitions is
    # the sensitive regime; repeat to catch nondeterminism.
    from e_commerce_lakehouse_spark.operators.curation import distributed_cumsum

    n = 20000
    df = spark.range(n).selectExpr(
        # thousands of near-identical prefixes, unique suffix
        "concat(lpad(cast(id % 7 as string), 4, '0'), '-', "
        "lpad(cast(id as string), 10, '0')) AS k",
        "1 AS one",
    )
    for _ in range(3):
        out = distributed_cumsum(
            df, order_col="k", value_col="one", out_col="rk", num_partitions=16
        )
        ranks = [r.rk for r in out.select("rk").collect()]
        assert len(ranks) == n
        assert sorted(ranks) == list(range(1, n + 1))


def test_state_timeline_null_key_counts_and_horizon_clamp(spark):
    from e_commerce_lakehouse_spark.operators.scd import state_timeline

    rows = [
        (None, _ts(1), 1, "view"),   # NULL key IS a key
        (1, _ts(1), 2, "view"),
        (1, _ts(3), 3, "click"),
    ]
    dim = scd2_build(_events(spark, rows), "user_id", "ts", "event_id", "event_type")
    out = {r.state: r for r in state_timeline(dim, "user_id").collect()}
    assert out["view"].n_keys == 2  # count_distinct alone would say 1
    assert out["view"].peak_concurrent == 2
    # explicit horizon BEFORE the click version: it is excluded, and the
    # open 'view' versions clamp to the horizon (no negative durations)
    early = {r.state: r for r in
             state_timeline(dim, "user_id", horizon_ts=_ts(2)).collect()}
    assert "click" not in early
    assert early["view"].occupied_us == 2 * 24 * 3600 * 1_000_000
    assert early["view"].n_versions == 2


def test_rolling_zscore_min_periods_one_never_flags_nan(spark):
    from e_commerce_lakehouse_spark.operators.eventops import (
        rolling_zscore_anomalies,
    )

    # 2 events: the second has exactly ONE trailing value -> sample
    # stddev is NaN; Spark orders NaN above every number, so an
    # unfloored guard would emit a NaN z as an "anomaly"
    df = spark.createDataFrame(
        [(1, _ts(1), 1, 10.0), (1, _ts(2), 2, 99.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = rolling_zscore_anomalies(df, min_periods=1).collect()
    assert out == []
