"""Driver-contract guards (VERDICT r1 'next round' #1/#2/#10).

The grading driver records CORRECTNESS rows for only the first
``GRADING_WINDOW`` queries in ``queries()`` order, and its
canonicalizer (pandas ``sort_values`` over all columns) crashes on
non-hashable cells. These tests make both constraints durable:

- every declared query's output schema uses only driver-safe column
  types (no arrays/maps/structs, no date/timestamp, no raw float32,
  no binary);
- the grading order puts not-yet-driver-green queries first, and the
  union of past CORRECTNESS rows plus the current window covers every
  registered query — a future registration reshuffle cannot silently
  un-grade a family.
"""

from __future__ import annotations

import json
from pathlib import Path

import pyspark.sql.types as T
import pytest

from frafka_spark.registry import (
    DRIVER_GRADED_GREEN,
    GRADING_WINDOW,
    QUERIES,
    get_oracle_sql,
    get_queries,
)

from tests.conftest import SF_DIR

REPO = Path(__file__).resolve().parent.parent

# Types the driver's pandas canonicalizer hashes reliably.
_SAFE = (
    T.StringType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.BooleanType,
    T.DecimalType,
)


def test_all_query_schemas_driver_safe(spark):
    offenders = {}
    for name, fn in get_queries().items():
        schema = fn(spark, SF_DIR).schema
        bad = [
            (f.name, f.dataType.simpleString())
            for f in schema.fields
            if not isinstance(f.dataType, _SAFE)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"driver-unsafe output columns: {offenders}"


def test_grading_order_prioritizes_ungraded():
    names = list(get_queries())
    ungraded = [n for n in names if n not in DRIVER_GRADED_GREEN]
    # all ungraded queries precede all driver-green ones...
    assert names[: len(ungraded)] == ungraded
    # ...and no green query occupies a graded slot while an ungraded
    # one waits outside the window (overflowing ungraded queries are
    # allowed — they grade next round, tracked by the union test)
    window = names[:GRADING_WINDOW]
    if len(ungraded) >= GRADING_WINDOW:
        assert all(n not in DRIVER_GRADED_GREEN for n in window)


def test_oracle_order_matches_query_order():
    q = list(get_queries())
    o = list(get_oracle_sql())
    assert o == [n for n in q if QUERIES[n].oracle is not None]


def test_correctness_union_covers_registry():
    """Union of past driver rows + the current window ⊇ all queries."""
    seen: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        try:
            seen |= set(json.loads(f.read_text()))
        except (json.JSONDecodeError, TypeError):  # pragma: no cover
            pass
    if not seen:  # round 1: no driver artifact yet
        pytest.skip("no CORRECTNESS_r*.json present")
    from frafka_spark.registry import LATE_PRIORITY

    window = set(list(get_queries())[:GRADING_WINDOW])
    missing = set(QUERIES) - seen - window
    # only explicitly-queued late-priority names may wait for a later
    # round; anything else unaccounted for is a real coverage hole
    assert missing <= LATE_PRIORITY, (
        f"queries with no past driver row, outside the next grading "
        f"window, and not queued as LATE_PRIORITY: {sorted(missing - LATE_PRIORITY)}"
    )


def test_driver_green_names_exist():
    get_queries()  # populate the registry
    unknown = DRIVER_GRADED_GREEN - set(QUERIES)
    assert not unknown, f"DRIVER_GRADED_GREEN has unregistered names: {sorted(unknown)}"
