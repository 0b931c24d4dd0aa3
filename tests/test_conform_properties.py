"""Property-based tests for the conform layer (hypothesis).

The conform contract claims invariance properties the example tests can't
sweep: ANY casing of ANY accepted candidate spelling, with ANY subset of
optional columns present, must produce exactly the contract schema, and
the row-preservation rule depends only on pickup-datetime parseability.
"""

from __future__ import annotations

import random as _random

from hypothesis import HealthCheck, given, settings, strategies as st

from nyc_taxi_data_engineering_project_spark.conform import conform_trips
from nyc_taxi_data_engineering_project_spark.schemas import (
    CANDIDATES,
    TRIPS_SCHEMA,
)

CONTRACT_FIELDS = [f.name for f in TRIPS_SCHEMA.fields]


def _recase(name: str, seed: int) -> str:
    rng = _random.Random(seed)
    return "".join(
        ch.upper() if rng.random() < 0.5 else ch.lower() for ch in name
    )


@st.composite
def source_frames(draw):
    """A (columns, values) spec: for each contract column, maybe-present,
    under a randomly-cased randomly-chosen candidate spelling."""
    cols = {}
    for target in CONTRACT_FIELDS:
        cands = CANDIDATES[target]
        if not cands:
            continue
        present = draw(st.booleans()) or target == "pickup_datetime"
        if not present:
            continue
        spelling = draw(st.sampled_from(cands))
        cased = _recase(spelling, draw(st.integers(0, 2**16)))
        cols[target] = cased
    return cols


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=source_frames())
def test_schema_invariance_under_spelling_and_subset(spark, spec):
    values = {
        src: ("2025-11-03 10:00:00" if target == "pickup_datetime"
              else "2025-11-03 10:30:00"
              if target == "dropoff_datetime" else "1")
        for target, src in spec.items()
    }
    df = spark.createDataFrame([tuple(values.values())],
                               list(values.keys()))
    out = conform_trips(df)
    # exact contract schema, independent of input spelling/subset
    assert [f.name for f in out.schema.fields] == CONTRACT_FIELDS
    assert [f.dataType for f in out.schema.fields] == [
        f.dataType for f in TRIPS_SCHEMA.fields
    ]
    rows = out.collect()
    assert len(rows) == 1  # parseable pickup → row survives
    r = rows[0].asDict()
    for target in CONTRACT_FIELDS:
        if target not in spec and CANDIDATES[target]:
            assert r[target] is None, f"{target} should be null-injected"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    # require at least one char outside any timestamp alphabet so the
    # string can never accidentally parse (e.g. "12:30" would)
    garbage=st.text(min_size=1, max_size=20).filter(
        lambda s: any(c not in "0123456789-:+./TZz ampAMP" for c in s)
    ),
    seed=st.integers(0, 2**16),
)
def test_unparseable_pickup_always_drops(spark, garbage, seed):
    cased = _recase("lpep_pickup_datetime", seed)
    df = spark.createDataFrame([(garbage,)], [cased])
    # arbitrary junk coerces to null and the A9 filter removes the row;
    # with the filter disabled the row survives with a null pickup
    assert conform_trips(df).count() == 0
    kept = conform_trips(df, drop_null_pickup=False).collect()
    assert len(kept) == 1 and kept[0].pickup_datetime is None
