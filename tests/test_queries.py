"""Differential tests: every registered query vs its DuckDB oracle.

One parametrized test per registry entry — this replicates the
driver's t2 gate locally (SURVEY.md §5.3.1) so declaration is never a
risk. Queries without an oracle get the rows-only check plus any
dedicated property tests elsewhere in tests/.
"""

from __future__ import annotations

import pytest

import frafka_spark
from frafka_spark.registry import QUERIES

from tests.conftest import assert_query_matches_oracle

frafka_spark.load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    assert_query_matches_oracle(spark, duck, name)
