"""Scale-invariance conventions for frequency cutoffs, and the
per-oracle declaration table the convention test enforces.

Round-8's sf10 ladder surfaced a class of bug no correctness gate
can catch: ``dd_ngram_jaccard_pruned``'s stop-shingle cutoff
(drop shingles with df > 5) hash-AGREED with its oracle at every
gate scale while silently pruning ALL candidates at 100× data —
every shingle's document frequency had outgrown the constant. The
defect class is an ABSOLUTE frequency cutoff whose bite grows with
the corpus. This module makes the convention mechanical, the same
governance pattern as ``plans/null_rules.py``: every frequency
comparison against a literal in an oracle (or plan source) must be
declared under a named rule, and ``tests/test_scale_convention.py``
fails the build on an undeclared one.

The direction taxonomy (the "why" behind each rule):

``corpus-relative``
    The cutoff derives from corpus statistics — e.g. the stop-shingle
    cutoff ``max(_STOP_DF, n_docs // _STOP_PER_DOCS)``. REQUIRED for
    every *strengthening* cutoff (drop-if-frequency-exceeds-K):
    frequencies grow with the corpus, so a fixed K eventually drops
    everything. Corpus-relative forms compare against an expression,
    not a literal, so they never appear in the declaration table —
    the rule name exists for docstrings and markers.

``weakening-floor``
    A keep-if-frequency-≥-K floor (hapax/noise pruning: inverted
    index df ≥ 5, PMI bigram support ≥ 5, boilerplate chunk
    df ≥ 3). Growth only ADMITS more rows through such a floor — it
    can never silently empty a result — so an absolute K is safe;
    what K *means* at a given corpus size is calibration, documented
    in the query's docstring.

``semantic-multiplicity``
    ≥ 2 meaning "appears more than once" — the operator's own
    definition of duplication (span dedup, exact-dup groups), not a
    tuning knob. Scale-free by construction.

``convention-noop``
    ``HAVING COUNT(*) > 0`` — the empty-input convention's
    alignment clause, a no-op on any non-empty input.

To add a frequency cutoff: a strengthening cutoff MUST be written
corpus-relative (compare against a derived expression — the test
cannot see intent, only literals, so literals must all be floors);
a weakening floor gets a ``query -> {construct: rule}`` entry below
(oracle SQL) or an inline ``# scale: <rule>`` marker within two
lines (plan/operator source). The test names the exact entry to add
when it fails.
"""

from __future__ import annotations

import re

#: rule name -> one-line reminder (full definitions in the docstring)
SCALE_RULES: dict[str, str] = {
    "corpus-relative": "cutoff derives from corpus statistics; "
                       "required for strengthening (drop-if-hot) cutoffs",
    "weakening-floor": "keep-if-count>=K noise floor; growth only "
                       "admits more rows, can never empty a result",
    "semantic-multiplicity": ">=2 IS the definition of 'duplicated'; "
                             "not a tuning knob",
    "convention-noop": "HAVING COUNT(*) > 0 — empty-input convention "
                       "alignment, no-op on non-empty input",
}

# Frequency-ish identifiers whose comparison against an integer
# literal constitutes a declared-or-fail construct. Length/size/id
# comparisons are deliberately out of class: they bound ROW SHAPE,
# not corpus frequency, and do not strengthen with corpus growth.
_FREQ_COMPARE = re.compile(
    r"(?:\bCOUNT\(\s*\*\s*\)|\b(?:df|n_docs|cnt|c_xy|freq|support|"
    r"occurrences|doc_freq|n_boiler\w*)\b[\"')\]]*)"
    r"\s*(>=|>|<=|<)\s*([0-9]+)\b",
    re.IGNORECASE,
)


def constructs_in(text: str) -> set[str]:
    """Normalized frequency-cutoff snippets in ``text`` — e.g.
    ``COUNT(*) >= 5`` or ``n_docs >= 3``. SQL (``--``) and Python
    (``#``) comments are stripped first: prose ABOUT a cutoff is not
    a cutoff."""
    text = re.sub(r"--[^\n]*|#[^\n]*", "", text)
    out = set()
    for m in _FREQ_COMPARE.finditer(text):
        head = m.group(0)[: m.start(1) - m.start(0)].strip()
        head = re.sub(r"\s+", "", head)
        if head.upper().startswith("COUNT("):
            head = "COUNT(*)"
        else:
            head = head.strip("\"')]").lower()
        out.add(f"{head} {m.group(1)} {m.group(2)}")
    return out


#: oracle declarations: query -> {normalized construct: rule}
DECLARED: dict[str, dict[str, str]] = {
    # 8-word chunk in >= 3 distinct docs counts as boilerplate: a
    # keep-floor on the boiler flag — growth flags more chunks,
    # never fewer; calibration note in the query docstring.
    "txt_boilerplate_passages": {"n_docs >= 3": "weakening-floor"},
    # hapax pruning of index entries: df >= 5 admits more words as
    # the corpus grows; the index can only get larger.
    "txt_inverted_index": {"COUNT(*) >= 5": "weakening-floor"},
    # a window fingerprint seen >= 2 times IS a duplicated span.
    "dd_span_dedup": {"COUNT(*) >= 2": "semantic-multiplicity"},
    # bigram support floor >= 5 (hapax noise); PMI ranking itself is
    # frequency-normalized.
    "txt_pmi_bigrams": {"c_xy >= 5": "weakening-floor"},
    # empty-input convention alignment clauses.
    "a_rollup_report": {"COUNT(*) > 0": "convention-noop"},
    "a_cube_report": {"COUNT(*) > 0": "convention-noop"},
}
