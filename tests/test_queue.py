"""CoverageRecord queue state-machine tests: register idempotence,
force re-register, retry backoff eligibility, outcome application."""

from __future__ import annotations

from pyspark.sql import functions as F

from metadata_wrangler_spark.operators import queue


def _records(spark):
    return spark.createDataFrame(
        [
            (1, "oclc", "classify", queue.SUCCESS, "2024-01-01 00:00:00", None),
            (2, "oclc", "classify", queue.TRANSIENT, "2024-01-01 00:00:00", "boom"),
            (3, "oclc", "classify", queue.TRANSIENT, "2024-01-02 12:00:00", "boom"),
            (4, "oclc", "classify", queue.REGISTERED, "2024-01-03 00:00:00", None),
        ],
        "identifier_id bigint, data_source string, operation string, "
        "status string, ts string, exception string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _items(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "identifier_id bigint")


def test_register_skips_existing_adds_missing(spark):
    out = queue.register(_records(spark), _items(spark, [1, 5]),
                         "oclc", "classify", ts="2024-02-01")
    got = {r["identifier_id"]: r["status"] for r in out.collect()}
    assert got[1] == queue.SUCCESS          # untouched
    assert got[5] == queue.REGISTERED       # appended
    assert len(got) == 5


def test_register_force_resets_existing(spark):
    out = queue.register(_records(spark), _items(spark, [1]),
                         "oclc", "classify", ts="2024-02-01", force=True)
    got = {r["identifier_id"]: r["status"] for r in out.collect()}
    assert got[1] == queue.REGISTERED


def test_eligible_registered_plus_expired_transients(spark):
    out = queue.eligible(_records(spark), "2024-01-02 00:00:00",
                         backoff_seconds=3600)
    ids = {r["identifier_id"] for r in out.collect()}
    # 2: transient, 24h old > backoff -> eligible; 3: in the future
    # relative to now -> not; 1: success -> never; 4: registered -> yes
    assert ids == {2, 4}


def test_apply_outcomes_untouched_rows_pass_through(spark):
    recs = _records(spark)
    outcomes = spark.createDataFrame(
        [(4, "oclc", "classify", queue.SUCCESS, None)],
        "identifier_id bigint, data_source string, operation string, "
        "new_status string, new_exception string",
    )
    out = queue.apply_outcomes(recs, outcomes)
    got = {r["identifier_id"]: (r["status"], r["exception"])
           for r in out.collect()}
    assert got[4] == (queue.SUCCESS, None)
    assert got[2] == (queue.TRANSIENT, "boom")
    assert got[1] == (queue.SUCCESS, None)


def test_apply_outcomes_records_exception(spark):
    recs = _records(spark)
    outcomes = spark.createDataFrame(
        [(4, "oclc", "classify", queue.PERSISTENT, "404 not found")],
        "identifier_id bigint, data_source string, operation string, "
        "new_status string, new_exception string",
    )
    out = queue.apply_outcomes(recs, outcomes)
    got = {r["identifier_id"]: (r["status"], r["exception"])
           for r in out.collect()}
    assert got[4] == (queue.PERSISTENT, "404 not found")


def test_census_counts_by_status(spark):
    out = queue.census(_records(spark), retry_cutoff="2024-01-02 00:00:00")
    got = {r["status"]: (r["n_records"], r["retry_eligible"])
           for r in out.collect()}
    assert got[queue.TRANSIENT] == (2, 1)
    assert got[queue.SUCCESS] == (1, 1)
    assert got[queue.REGISTERED] == (1, 0)


def test_queue_fuzz_invariants(spark):
    """Hypothesis fuzz of the CoverageRecord state machine: after
    register + apply_outcomes on random states/outcomes — (1) keys
    are never duplicated or lost, (2) every item ends registered or
    keeps/receives a valid status, (3) persistent failures are never
    eligible, (4) rows untouched by outcomes pass through unchanged."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from metadata_wrangler_spark.operators import queue

    statuses = st.sampled_from([
        queue.REGISTERED, queue.SUCCESS, queue.TRANSIENT, queue.PERSISTENT,
    ])
    existing = st.lists(
        st.tuples(st.integers(0, 8), statuses),
        min_size=0, max_size=8, unique_by=lambda r: r[0],
    )
    items = st.lists(st.integers(0, 10), min_size=0, max_size=8,
                     unique=True)
    outcome_rows = st.lists(
        st.tuples(st.integers(0, 10), statuses),
        min_size=0, max_size=6, unique_by=lambda r: r[0],
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(cur=existing, its=items, outs=outcome_rows)
    def check(cur, its, outs):
        schema = ("identifier_id long, data_source string, "
                  "operation string, status string, ts timestamp, "
                  "exception string")
        records = spark.createDataFrame(
            [(k, "src", "op", s, None, None) for k, s in cur]
            or [(99, "src", "op", queue.SUCCESS, None, None)], schema)
        cur_d = dict(cur) if cur else {99: queue.SUCCESS}
        idf = spark.createDataFrame(
            [(i,) for i in its] or [(98,)], "identifier_id long")
        its_l = its or [98]

        reg = queue.register(records, idf, "src", "op", ts="2024-01-01")
        got = {r["identifier_id"]: r["status"] for r in reg.collect()}
        assert set(got) == set(cur_d) | set(its_l)  # no key lost/duped
        assert len(reg.collect()) == len(got)
        for k, sstat in got.items():
            if k in cur_d:
                assert sstat == cur_d[k]          # existing untouched
            else:
                assert sstat == queue.REGISTERED  # new items enqueued

        final = queue.apply_outcomes(
            reg,
            spark.createDataFrame(
                [(k, "src", "op", s) for k, s in outs]
                or [(97, "src", "op", queue.SUCCESS)],
                "identifier_id long, data_source string, "
                "operation string, new_status string"),
        )
        outs_d = dict(outs) if outs else {97: queue.SUCCESS}
        fgot = {r["identifier_id"]: r["status"] for r in final.collect()}
        assert set(fgot) == set(got)              # outcomes never add keys
        for k, sstat in fgot.items():
            assert sstat == outs_d.get(k, got[k])  # outcome wins, else kept

        elig = {r["identifier_id"]
                for r in queue.eligible(final, "2024-01-02",
                                        backoff_seconds=0).collect()}
        for k in elig:
            assert fgot[k] in (queue.REGISTERED, queue.TRANSIENT)

    check()
