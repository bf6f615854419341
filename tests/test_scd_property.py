"""Property-based SCD2 invariants (hypothesis): for ANY append-ordered
split of ANY event log,

1. scd2_apply(dim(prefix), suffix) == scd2_build(whole log)  (the
   incremental/batch equivalence q119 pins on one fixed input), and
2. per key: versions are 1..n contiguous, intervals are half-open,
   non-overlapping, chain exactly (valid_to == next valid_from), only
   the last is open, and no two consecutive versions share a state
   (collapse is complete).

The log generator stresses the same shapes as the events fuzz corpus —
duplicate timestamps (tiebreak determinism), duplicate states, NULL
states — but over the whole randomized input space. Spark-per-example
is slow, so examples are capped; the seeded fuzz gates carry volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from e_commerce_lakehouse_spark.operators.scd import scd2_apply, scd2_build

from tests.conftest import assert_same_rows

_SCHEMA = "user_id long, ts timestamp, event_id long, event_type string"
_T0 = dt.datetime(2024, 3, 1)

# (key, ts-offset-minutes, state) — event_id is assigned by enumeration,
# so equal (key, ts) pairs get distinct, deterministic tiebreaks
_event = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=30),
    st.sampled_from(["a", "b", "c", None]),
)


@st.composite
def _log_and_cut(draw):
    evs = draw(st.lists(_event, min_size=1, max_size=25))
    cut = draw(st.integers(min_value=0, max_value=30))
    return evs, cut


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_log_and_cut())
def test_scd2_incremental_equals_batch_and_intervals_well_formed(spark, case):
    evs, cut = case
    rows = [
        (k, _T0 + dt.timedelta(minutes=m), i + 1, s)
        for i, (k, m, s) in enumerate(sorted(evs, key=lambda e: e[1]))
    ]
    # append-ordered split: the batch is everything strictly after `cut`
    # minutes (event_ids grow with ts, so the contract holds by
    # construction)
    cutoff = _T0 + dt.timedelta(minutes=cut)
    old = [r for r in rows if r[1] <= cutoff]
    new = [r for r in rows if r[1] > cutoff]

    full_df = spark.createDataFrame(rows, _SCHEMA)
    full = scd2_build(full_df, "user_id", "ts", "event_id", "event_type")

    if old and new:
        dim = scd2_build(
            spark.createDataFrame(old, _SCHEMA),
            "user_id", "ts", "event_id", "event_type",
        )
        inc = scd2_apply(
            dim,
            spark.createDataFrame(new, _SCHEMA),
            "user_id", "ts", "event_id", "event_type",
        )
        assert_same_rows(inc, full)

    by_key: dict = {}
    for r in full.collect():
        by_key.setdefault(r.user_id, []).append(r)
    for key, vers in by_key.items():
        vers.sort(key=lambda r: r.version)
        assert [v.version for v in vers] == list(range(1, len(vers) + 1))
        for a, b in zip(vers, vers[1:]):
            assert a.valid_to == b.valid_from  # exact chaining
            assert a.valid_from <= a.valid_to  # half-open, may be empty
            assert not a.is_current
            assert a.state != b.state or (a.state is None) != (b.state is None)
        assert vers[-1].valid_to is None and vers[-1].is_current
