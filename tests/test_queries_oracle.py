"""SQL conformance: every declared query vs the DuckDB oracle (SURVEY §5.2)."""

from __future__ import annotations

import pytest

from model_presto_spark.plans.queries import QUERIES
from model_presto_spark.testing import compare_query


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    problems = compare_query(spark, oracle, QUERIES[name], sf_dir)
    assert not problems, f"{name}: {problems}"
