"""Empty-input equivalence net: every oracle-paired query must
hash-match its DuckDB oracle on a ZERO-ROW mirror of the test
tables, and every oracle-less query must at least run without
crashing.

Empty inputs are every cold-start partition and every
predicate-prunes-everything incremental run at 100 TB — not a
corner case. The round-8 sweep (tools/empty_ladder.py) found the
surface remarkably clean — zero crashes across 221 queries — and
three plan/oracle drifts, all of one class: SQL emits rows over an
empty input that a Spark plan structurally cannot (the ANSI
zero-count grand-total row of ROLLUP/CUBE, which Spark's Expand
never produces, and a recursive-CTE seed row spelled as a bare
literal instead of being derived from the node set). The fixes are
the documented empty-input convention in ``plans/__init__``'s
docstring; this module keeps the class fixed.
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
from empty_ladder import build_mirror  # noqa: E402

from metadata_wrangler_spark import plans  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

plans.load_all_plans()
ALL_QUERIES = plans.ordered_queries()


@pytest.fixture(scope="module")
def ladder(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("sf_empty_ladder"))
    build_mirror(SRC, dst)
    con = oracle_connection(dst)
    yield dst, con
    con.close()


@pytest.mark.parametrize("name", list(ALL_QUERIES))
def test_empty_ladder_match(name, spark, ladder):
    dst, con = ladder
    problems = check_one(
        spark, con, ALL_QUERIES[name], plans.ORACLES.get(name), dst
    )
    assert not problems, f"{name} on the empty ladder: {'; '.join(problems)}"
