"""The full-coverage correctness net: EVERY registered query plan is
hash-checked against its DuckDB oracle at sf0.001, every pytest run.

The driver's per-round gate only covers the leading 50-entry window
(plans/__init__.py:VERIFICATION_PRIORITY rotates what sits inside
it); this sweep is the net under the other ~59 — a silent behavioral
drift in any behind-window query fails ``pytest tests/`` locally,
long before a window rotation would surface it.

Comparison logic is shared verbatim with tools/check_oracle.py
(``check_one``), which is itself the local mirror of the driver's
gate: row count, column-name set, and an order-insensitive
sha256 value hash over normalized cells.

sf0.001 keeps the sweep fast (~60 s on the shared test session);
``python tools/check_oracle.py /root/testdata/sf0.01`` runs the same
check at the driver's scale factor.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import check_one, oracle_connection  # noqa: E402

from metadata_wrangler_spark import plans  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

plans.load_all_plans()
ALL_QUERIES = plans.ordered_queries()


@pytest.fixture(scope="module")
def duck():
    con = oracle_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", list(ALL_QUERIES))
def test_oracle_match(name, spark, duck):
    problems = check_one(
        spark, duck, ALL_QUERIES[name], plans.ORACLES.get(name), SF_DIR
    )
    assert not problems, f"{name}: {'; '.join(problems)}"
