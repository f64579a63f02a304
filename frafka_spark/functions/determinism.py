"""Cross-engine float-determinism helpers (SURVEY.md §5.4).

Two hazards make naive ``round(float_agg, 4)`` flaky across engines:

1. **Tie-breaking**: Spark ``round`` is HALF_UP on the double's
   shortest decimal repr; DuckDB rounds the raw binary double. The
   fixture data has exact 2-decimal inputs, so derived values land
   exactly on rounding boundaries and the two engines split ties
   differently.
2. **Summation order**: float sums are order-dependent; Spark's
   partial-aggregate tree and DuckDB's parallel aggregate add in
   different (and run-to-run varying) orders, so last-ulp differences
   can cross a rounding boundary.

Fixes used throughout the registered queries:

- Per-row computed floats: round ≥2 digits beyond the value's exact
  decimal precision (identity round — both engines recover the same
  decimal and produce the identical nearest double).
- Aggregate sums over exact-decimal terms: sum in ``DECIMAL(38,6)``
  (exact integer arithmetic — order-independent) and cast the result
  to double. Bitwise identical across engines and across partition
  layouts; this is also the 100 TB-safe formulation (decimal partial
  aggregates combine exactly on any cluster shape).
- Averages: exact decimal sum / count, then round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent exact sum of a float column → double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_avg(col: Column | str, alias: str | None = None, digits: int = 4) -> Column:
    """Deterministic average: exact decimal sum / count, rounded."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.round(F.sum(c.cast(DEC)).cast("double") / F.count(F.lit(1)), digits)
    return out.alias(alias) if alias else out


def sql_dec_sum(expr: str) -> str:
    """DuckDB oracle twin of :func:`dec_sum`."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_dec_avg(expr: str, digits: int = 4) -> str:
    """DuckDB oracle twin of :func:`dec_avg`."""
    return f"round({sql_dec_sum(expr)} / count(*), {digits})"
