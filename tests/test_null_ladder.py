"""NULL-ladder equivalence net: every oracle-paired query must
hash-match its DuckDB oracle on a NULL-injected mirror of the test
data, not just on the generator's NULL-free output.

Round-6 advice found one generator-dependent alignment bug
(a_mad_robust counted NULL values the plan excluded); the round-7
sweep over this ladder found 49 more across six families — NULLS
LAST-vs-FIRST rank drift, COUNT(*)-vs-COUNT(col), USING joins
dropping NULL keys, DuckDB max_by skipping NULL payloads, concat
vs concat_ws NULL algebra, and NULL-payload rows padding top-k
lists. Each fix is a documented NULL rule shared by plan and
oracle; this module keeps the whole class fixed.

Mirror layout: tools/null_ladder.py::NULL_PLAN — every measure and
low-cardinality group/flag column NULLed on a deterministic slice
of its table's primary key; keys and FKs stay intact.
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
from null_ladder import build_mirror  # noqa: E402

from metadata_wrangler_spark import plans  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

plans.load_all_plans()
ALL_QUERIES = plans.ordered_queries()


@pytest.fixture(scope="module")
def ladder(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_null_ladder"))
    build_mirror(SRC, dst)
    con = oracle_connection(dst)
    yield dst, con
    con.close()


@pytest.mark.parametrize("name", list(ALL_QUERIES))
def test_null_ladder_match(name, spark, ladder):
    dst, con = ladder
    problems = check_one(
        spark, con, ALL_QUERIES[name], plans.ORACLES.get(name), dst
    )
    assert not problems, f"{name} on the NULL ladder: {'; '.join(problems)}"
