"""NULL-convention governance: every NULL-handling construct in an
oracle SQL string must be declared under a NAMED rule in
``plans/null_rules.py`` (round-7 verdict, "What's wrong" #2 — the
per-query NULL alignments must not drift from the documented
convention).

Failure modes caught:
  * a NEW oracle (or an edit) introduces IS [NOT] NULL / COALESCE /
    IS NOT DISTINCT FROM / NULLIF / IFNULL without declaring which
    convention it follows → undeclared-construct failure naming the
    exact entry to add;
  * a declaration outlives the construct it documents (the oracle
    was rewritten) → stale-declaration failure;
  * a declaration cites a rule name that is not defined →
    unknown-rule failure.

No Spark session needed — this is pure text governance, so it runs
in milliseconds at the front of every pytest invocation.
"""

from __future__ import annotations

from metadata_wrangler_spark.plans import ORACLES, load_all_plans
from metadata_wrangler_spark.plans.null_rules import (
    DECLARED,
    NULL_RULES,
    constructs_in,
)

load_all_plans()


def test_every_null_construct_is_declared():
    problems = []
    for name, sql in sorted(ORACLES.items()):
        found = constructs_in(sql)
        declared = set(DECLARED.get(name, {}))
        for kind in sorted(found - declared):
            problems.append(
                f"{name}: oracle uses {kind!r} but plans/null_rules.py "
                f"declares no rule for it — add "
                f'DECLARED["{name}"]["{kind}"] = "<rule>"'
            )
        for kind in sorted(declared - found):
            problems.append(
                f"{name}: declaration for {kind!r} is stale (the "
                "oracle no longer contains that construct) — remove it"
            )
    assert not problems, "\n".join(problems)


def test_declarations_cite_defined_rules():
    bad = [
        f"{name}.{kind}: unknown rule {rule!r}"
        for name, kinds in DECLARED.items()
        for kind, rule in kinds.items()
        if rule not in NULL_RULES
    ]
    assert not bad, "\n".join(bad)


def test_declared_queries_are_registered():
    ghosts = sorted(set(DECLARED) - set(ORACLES))
    assert not ghosts, (
        f"plans/null_rules.py declares rules for unregistered "
        f"oracles: {ghosts}"
    )
