"""Scale-invariance governance: every frequency comparison against
an integer literal — in an oracle SQL string or in plan/operator
source — must be declared under a NAMED rule in
``plans/scale_rules.py`` (round-8 verdict item 7: the
dd_ngram_jaccard_pruned stop-shingle bug — an absolute
drop-if-hot cutoff that hash-agreed with its oracle while pruning
every candidate at 100× data — was found by ACCIDENT of the sf10
ladder; this test makes the constant class impossible to add
silently).

Failure modes caught:
  * a new oracle (or an edit) introduces a frequency-literal cutoff
    without declaring its direction class → undeclared-construct
    failure naming the exact entry to add;
  * a declaration outlives its construct → stale-declaration
    failure;
  * a declaration cites an undefined rule → unknown-rule failure;
  * plan/operator SOURCE gains a frequency-literal comparison with
    no ``# scale: <rule>`` marker within two lines and no matching
    oracle declaration → unmarked-source failure.

No Spark session needed — pure text governance, milliseconds.
"""

from __future__ import annotations

import pathlib
import re

from metadata_wrangler_spark.plans import ORACLES, load_all_plans
from metadata_wrangler_spark.plans.scale_rules import (
    DECLARED,
    SCALE_RULES,
    constructs_in,
)

load_all_plans()

_SRC_ROOT = pathlib.Path(__file__).resolve().parent.parent
_SRC_DIRS = [
    _SRC_ROOT / "metadata_wrangler_spark" / "plans",
    _SRC_ROOT / "metadata_wrangler_spark" / "operators",
]
_MARKER = re.compile(r"scale:\s*([a-z-]+)")


def test_every_oracle_frequency_cutoff_is_declared():
    problems = []
    for name, sql in sorted(ORACLES.items()):
        found = constructs_in(sql)
        declared = set(DECLARED.get(name, {}))
        for c in sorted(found - declared):
            problems.append(
                f"{name}: oracle compares a frequency against a "
                f"literal ({c!r}) with no declared direction class — "
                f"if it is a strengthening (drop-if-hot) cutoff it "
                f"must be corpus-relative; if a keep-floor, add "
                f'DECLARED["{name}"]["{c}"] = "weakening-floor" '
                f"to plans/scale_rules.py"
            )
        for c in sorted(declared - found):
            problems.append(
                f"{name}: declaration for {c!r} is stale (the oracle "
                "no longer contains that construct) — remove it"
            )
    assert not problems, "\n".join(problems)


def test_declarations_cite_defined_rules():
    bad = [
        f"{name}.{c}: unknown rule {rule!r}"
        for name, cs in DECLARED.items()
        for c, rule in cs.items()
        if rule not in SCALE_RULES
    ]
    assert not bad, "\n".join(bad)


def test_source_frequency_cutoffs_are_marked_or_declared():
    """Plan/operator .py source: every frequency-literal comparison
    must carry an inline ``# scale: <rule>`` marker within the two
    preceding lines (or on the line), or match a construct already
    declared for some oracle (embedded oracle SQL hits resolve this
    way — same constant, same rule)."""
    declared_anywhere = {
        c for cs in DECLARED.values() for c in cs
    }
    problems = []
    for d in _SRC_DIRS:
        for path in sorted(d.glob("*.py")):
            if path.name == "scale_rules.py":
                continue  # the governance module quotes offenders
            lines = path.read_text().splitlines()
            for i, line in enumerate(lines):
                found = constructs_in(line)
                if not found:
                    continue
                window = "\n".join(lines[max(0, i - 2): i + 1])
                marker = _MARKER.search(window)
                if marker:
                    if marker.group(1) not in SCALE_RULES:
                        problems.append(
                            f"{path.name}:{i + 1}: marker cites "
                            f"unknown rule {marker.group(1)!r}"
                        )
                    continue
                undeclared = found - declared_anywhere
                if undeclared:
                    problems.append(
                        f"{path.name}:{i + 1}: frequency-literal "
                        f"cutoff(s) {sorted(undeclared)} with no "
                        f"'# scale: <rule>' marker and no oracle "
                        f"declaration"
                    )
    assert not problems, "\n".join(problems)
