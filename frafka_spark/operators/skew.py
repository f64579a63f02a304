"""Skew mitigation — salted joins (plans/scale_notes.md § joins).

AQE's skew-join split handles most skew automatically; salting is
the manual fallback for pathological keys (one user with 10⁹ events
joining a per-user dimension). The mechanics:

- fact side: append a random-but-deterministic salt (hash of row
  payload mod N) to the join key → the hot key's rows spread over N
  shuffle partitions;
- dim side: replicate each row N times (one per salt value);
- join on (key, salt), drop the salt.

Result-identical to the plain join (verified in
tests/test_misc_ops.py), shuffle-balanced at any skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_fr_salt"


def salt_fact(df: DataFrame, n_salts: int, *payload_cols: str) -> DataFrame:
    """Add a deterministic salt derived from payload columns.

    Deterministic (hash, not rand()) so retried tasks salt
    identically — a rand() salt breaks exactly-once sinks under task
    retry.
    """
    cols = list(payload_cols) or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*cols), F.lit(n_salts)).cast("int")
    )


def replicate_dim(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each dimension row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key load spread over ``n_salts`` partitions.

    ``on`` is the ordinary join condition; the salt equality is added
    on top. The dim side is replicated, so prefer this only when the
    dim is small-ish and the fact key is skewed (otherwise broadcast
    or AQE already wins).
    """
    f = salt_fact(fact, n_salts)
    d = replicate_dim(dim, n_salts)
    joined = f.join(d, on & (f[SALT_COL] == d[SALT_COL]), how)
    return joined.drop(SALT_COL)
