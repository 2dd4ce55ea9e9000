"""operators/selection.py — exact histogram-refinement selection vs
a brute-force pandas oracle, over ties, weights, NULL group keys,
negative values, and ranges wide enough to force multiple
refinement rounds."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from metadata_wrangler_spark.operators.selection import (GroupStats,
                                                         grouped_select)


def _brute(rows, gcols, tfn):
    """min v with cumulative weight ≥ target, per group/target."""
    groups = {}
    for rec in rows:
        key = tuple(rec[c] for c in gcols)
        groups.setdefault(key, []).append((rec["v"], rec.get("w", 1)))
    out = {}
    for key, vw in groups.items():
        vw.sort()
        n = len(vw)
        tot = sum(w for _v, w in vw)
        st = GroupStats(key, n, tot, vw[0][0], vw[-1][0])
        want = tfn(st)
        sel = {}
        for name, tgt in want.items():
            run = 0
            for v, w in vw:
                run += w
                if run >= tgt:
                    sel[name] = v
                    break
        out[key] = (n, tot, sel)
    return out


def _check(spark, rows, gcols, tfn, weight_col=None):
    sdf = spark.createDataFrame(rows)
    got = grouped_select(
        sdf, "v", tfn, group_cols=gcols, weight_col=weight_col
    )
    exp = _brute(rows, gcols, tfn)
    assert len(got) == len(exp)
    for rec in got:
        key = tuple(rec[c] for c in gcols)
        n, tot, sel = exp[key]
        assert rec["n"] == n
        assert rec["total_weight"] == tot
        for name, v in sel.items():
            assert rec[name] == v, (key, name, rec[name], v)


def test_median_with_ties_and_groups(spark):
    rng = random.Random(7)
    rows = [
        {"g": rng.choice(["a", "b", "c", None]),
         "v": rng.randrange(-50, 50)}
        for _ in range(2000)
    ]
    _check(
        spark, rows, ["g"],
        lambda st: {"med": (st.n - 1) // 2 + 1,
                    "q1": (st.n - 1) // 4 + 1,
                    "q3": (st.n - 1) * 3 // 4 + 1,
                    "min": 1, "max": st.total_weight},
    )


def test_weighted_median_matches_running_weight_definition(spark):
    rng = random.Random(11)
    rows = [
        {"g": rng.choice(["x", "y"]),
         "v": rng.randrange(0, 1000) * 10,
         "w": rng.randrange(1, 9)}
        for _ in range(3000)
    ]
    _check(
        spark, rows, ["g"],
        lambda st: {"wmed": (st.total_weight + 1) // 2},
        weight_col="w",
    )


def test_wide_range_forces_multiple_rounds(spark):
    # values spread over ~2^40 → round shifts 24, 8, 0.
    rng = random.Random(13)
    rows = [{"g": "only", "v": rng.randrange(-(2 ** 40), 2 ** 40)}
            for _ in range(500)]
    _check(spark, rows, ["g"],
           lambda st: {"med": (st.n - 1) // 2 + 1})


def test_global_no_group_cols(spark):
    rows = [{"v": i % 17} for i in range(101)]
    got = grouped_select(
        spark.createDataFrame(rows), "v",
        lambda st: {"p50": (st.n - 1) // 2 + 1},
    )
    assert len(got) == 1
    vals = sorted(r["v"] for r in rows)
    assert got[0]["p50"] == vals[(101 - 1) // 2]


def test_single_value_group_resolves_without_scan(spark):
    rows = [{"g": "s", "v": 42}] * 5 + [{"g": "t", "v": -7}]
    _check(spark, rows, ["g"],
           lambda st: {"med": (st.n - 1) // 2 + 1})


def test_null_values_excluded(spark):
    sdf = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("a", None)],
        "g string, v int",
    )
    got = grouped_select(sdf, "v", lambda st: {"med": 1},
                         group_cols=["g"])
    assert got[0]["n"] == 2 and got[0]["med"] == 1


def test_target_out_of_range_raises(spark):
    sdf = spark.createDataFrame([("a", 1)], "g string, v int")
    with pytest.raises(ValueError):
        grouped_select(sdf, "v", lambda st: {"bad": 2},
                       group_cols=["g"])


def test_matches_window_spelling_on_skewed_data(spark):
    """99% of mass on one value, the rest spread over a huge range —
    the hot-bucket case the refinement loop must narrow through."""
    rng = random.Random(17)
    rows = [{"g": "h", "v": 0} for _ in range(990)] + [
        {"g": "h", "v": rng.randrange(1, 2 ** 35)} for _ in range(10)
    ]
    sdf = spark.createDataFrame(rows)
    got = grouped_select(
        sdf, "v",
        lambda st: {"p99": (st.n - 1) * 99 // 100 + 1},
        group_cols=["g"],
    )
    from pyspark.sql import Window as W

    exp = (
        sdf.withColumn(
            "rn", F.row_number().over(W.partitionBy("g").orderBy("v"))
        )
        .where(F.col("rn") == (1000 - 1) * 99 // 100 + 1)
        .collect()[0]["v"]
    )
    assert got[0]["p99"] == exp


def test_property_random_weighted_selection(spark):
    """Hypothesis property: for random grouped weighted multisets —
    including huge-magnitude values that force multi-round
    refinement and heavy ties — every requested quantile target
    matches the brute-force cumulative-weight walk."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.one_of(
        st.integers(-50, 50),                      # tie-heavy
        st.integers(-(2 ** 45), 2 ** 45),          # multi-round
    )
    rows_strategy = st.lists(
        st.tuples(st.sampled_from(["g1", "g2", None]), vals,
                  st.integers(1, 7)),
        min_size=5, max_size=120,
    )

    @settings(max_examples=8, deadline=None)
    @given(rows_strategy)
    def run(tuples):
        rows = [{"g": g, "v": v, "w": w} for g, v, w in tuples]
        _check(
            spark, rows, ["g"],
            lambda stt: {
                "p25": max(1, stt.total_weight // 4),
                "p50": (stt.total_weight + 1) // 2,
                "p100": stt.total_weight,
            },
            weight_col="w",
        )
    run()


def test_forced_multi_round_path_matches(spark, monkeypatch):
    """Force the worst-case refinement path (tiny BITS, no direct
    tier, no early finish) — every window must narrow bit by bit
    and still land on the brute-force answers."""
    import metadata_wrangler_spark.operators.selection as S

    monkeypatch.setattr(S, "BITS", 3)
    monkeypatch.setattr(S, "FINAL_BITS", 2)
    monkeypatch.setattr(S, "ROWS_DIRECT", 0)
    rng = random.Random(23)
    rows = [
        {"g": rng.choice(["a", "b"]),
         "v": rng.randrange(-(2 ** 21), 2 ** 21),
         "w": rng.randrange(1, 5)}
        for _ in range(300)
    ]
    _check(
        spark, rows, ["g"],
        lambda st: {"med": (st.total_weight + 1) // 2,
                    "p90": (st.total_weight * 9) // 10 or 1},
        weight_col="w",
    )


def test_decimal_weight_buffers_when_total_overflows_int64(spark):
    """Weights large enough that the group total exceeds 2^62 must
    route the histogram sums through DECIMAL buffers and still
    produce exact selections."""
    w = 1 << 60
    rows = [
        {"g": "big", "v": v, "w": w + v} for v in range(8)
    ]  # total ≈ 2^63 — int64 sum would overflow
    got = grouped_select(
        spark.createDataFrame(rows), "v",
        lambda st: {"half": (st.total_weight + 1) // 2},
        group_cols=["g"], weight_col="w",
    )
    tot = sum(w + v for v in range(8))
    assert got[0]["total_weight"] == tot
    run, tgt = 0, (tot + 1) // 2
    for v in range(8):
        run += w + v
        if run >= tgt:
            assert got[0]["half"] == v
            break


def test_known_stats_full_domain_width_falls_back_to_coarse(spark):
    """A caller-provided known_stats window spanning >= 2^63 (vmin
    near -2^63, vmax positive) would overflow the JVM-side
    `value - lit(lo)` subtraction if seeded into _refine directly;
    grouped_select must fall back to the coarse round (which caps
    window width at 2^44) and still return exact selections."""
    lo, hi = -(2 ** 62) - (2 ** 61), 2 ** 62  # span ≈ 1.5 * 2^63
    rows = [{"g": "wide", "v": v} for v in (lo, -5, 0, 7, hi)]
    got = grouped_select(
        spark.createDataFrame(rows), "v",
        lambda st: {"med": (st.n + 1) // 2,
                    "mn": 1, "mx": st.n},
        group_cols=["g"],
        known_stats=[GroupStats(("wide",), 5, 5, lo, hi)],
    )
    assert len(got) == 1
    assert got[0]["med"] == 0
    assert got[0]["mn"] == lo
    assert got[0]["mx"] == hi


def test_mad_robust_oracle_alignment_with_nulls(spark, tmp_path):
    """Round-6 advice: a_mad_robust's plan/oracle equivalence on
    NULLs was latent because the data generator emits none. Build an
    events mirror with NULL values AND a NULL event_type group and
    hash-check plan vs oracle on it — the NULL-value filter and the
    NULL-safe joins in the oracle must keep the two aligned."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from check_oracle import check_one, oracle_connection

    from metadata_wrangler_spark.plans import ORACLES, QUERIES, load_all_plans

    load_all_plans()
    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "sf_nullmad")
    os.makedirs(dst, exist_ok=True)
    # oracle_connection registers every table and DuckDB reads
    # single parquet FILES (like the driver's testdata), so build
    # the mirror with DuckDB copies: untouched tables verbatim,
    # events with NULLs injected into value and event_type.
    import duckdb

    from metadata_wrangler_spark.catalog import TABLES

    cp = duckdb.connect()
    for t in TABLES:
        sel = "*"
        if t == "events":
            sel = (
                "* REPLACE ("
                "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END"
                " AS value, "
                "CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type"
                " END AS event_type)"
            )
        cp.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    cp.close()
    con = oracle_connection(dst)
    try:
        for q in ("a_mad_robust", "a_weighted_median", "ev_gap_percentiles",
                  "a_percentile_disc"):
            problems = check_one(spark, con, QUERIES[q], ORACLES[q], dst)
            assert not problems, f"{q} on NULL ladder: {problems}"
    finally:
        con.close()


def test_nullable_integer_group_key_stays_exact_int(spark):
    """The r10 coarse round moves its histogram over Arrow
    (toArrow().to_pylist()). A nullable INTEGER group key must come
    back as exact Python ints / None — the pandas path would coerce
    the column to float64 (NaN for NULL), silently turning group
    keys into floats in the result records."""
    rows = [
        {"g": g, "v": v, "w": w}
        for g, vals in [
            (1, [(5, 2), (9, 1), (1, 3)]),
            (2, [(4, 1), (8, 5)]),
            (None, [(7, 2), (3, 2)]),
        ]
        for v, w in vals
    ]
    sdf = spark.createDataFrame(rows, "g bigint, v bigint, w bigint")
    got = grouped_select(
        sdf, "v",
        lambda st: {"half": (st.total_weight + 1) // 2},
        group_cols=["g"], weight_col="w",
    )
    by_key = {rec["g"]: rec for rec in got}
    assert set(by_key) == {1, 2, None}
    for k in by_key:
        assert k is None or type(k) is int
    # weighted medians by hand (target = (total+1)//2):
    # g=1 total 6, target 3: sorted 1(w3),5(w2),9(w1) -> cum 3 at 1
    assert by_key[1]["half"] == 1
    # g=2 total 6, target 3: 4(w1),8(w5) -> cum 6 at 8
    assert by_key[2]["half"] == 8
    # g=None total 4, target 2: 3(w2),7(w2) -> cum 2 at 3
    assert by_key[None]["half"] == 3
