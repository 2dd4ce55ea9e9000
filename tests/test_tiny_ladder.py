"""Boundary-regime equivalence net: every oracle-paired query must
hash-match its DuckDB oracle on a handful-of-rows, FK-consistent
mirror (tools/tiny_ladder.py) — groups of one row, top-k with
n < k, single-element quantiles, singleton LSH buckets, graphs
smaller than the walk depth.

The generator never produces this regime (its smallest scale is
~6k lineitem rows), yet at 100 TB it is every low-cardinality slice
of a high-cardinality partitioning — and it is where engine
defaults diverge hardest (rank ties, interpolation endpoints,
one-row window frames).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import check_one, oracle_connection  # noqa: E402
from tiny_ladder import build_mirror  # noqa: E402

from metadata_wrangler_spark import plans  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

plans.load_all_plans()
ALL_QUERIES = plans.ordered_queries()


@pytest.fixture(scope="module")
def ladder(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_tiny_ladder"))
    build_mirror(SRC, dst)
    con = oracle_connection(dst)
    yield dst, con
    con.close()


@pytest.mark.parametrize("name", list(ALL_QUERIES))
def test_tiny_ladder_match(name, spark, ladder):
    dst, con = ladder
    problems = check_one(
        spark, con, ALL_QUERIES[name], plans.ORACLES.get(name), dst
    )
    assert not problems, f"{name} on the tiny ladder: {'; '.join(problems)}"
