"""Exact-row tests for the as-of join, bucketed range join, sequence
packing, and boilerplate-passage plans on hand-built tables —
boundary cases the sf-data oracle comparison can't isolate (bucket
edges, missing prior match, bin straddling, short docs)."""

from __future__ import annotations

import datetime as dt

from metadata_wrangler_spark.plans import QUERIES, load_all_plans
from tests.conftest import rows

load_all_plans()

BASE = dt.datetime(2024, 1, 1)
BASE_EPOCH = int(
    dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
)


def _events_dir(spark, tmp_path, evs):
    (
        spark.createDataFrame(
            [
                (i, BASE + dt.timedelta(seconds=s), uid, et, 1.0)
                for i, (s, uid, et) in enumerate(evs)
            ],
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "events.parquet"))
    )
    return str(tmp_path)


def _docs_dir(spark, tmp_path, docs):
    (
        spark.createDataFrame(
            [
                (i, text, "en", source, len(text))
                for i, (source, text) in enumerate(docs)
            ],
            "doc_id bigint, text string, lang string, "
            "source string, n_chars bigint",
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "documents.parquet"))
    )
    return str(tmp_path)


def test_asof_join_matches_latest_prior_click(spark, tmp_path):
    sf = _events_dir(spark, tmp_path, [
        (10, 1, "click"),      # id 0
        (20, 1, "click"),      # id 1 — the as-of match
        (30, 1, "purchase"),   # id 2
        (40, 2, "purchase"),   # id 3 — user 2 has no click: NULL
        (50, 1, "purchase"),   # id 4 — still matches click at 20
    ])
    got = {
        r["event_id"]: (r["click_epoch"], r["gap_seconds"])
        for r in QUERIES["ev_asof_join"](spark, sf).collect()
    }
    assert got == {
        2: (BASE_EPOCH + 20, 10),
        3: (None, None),
        4: (BASE_EPOCH + 20, 30),
    }


def test_range_join_counts_within_60s_inclusive_edge(spark, tmp_path):
    sf = _events_dir(spark, tmp_path, [
        (100, 1, "error"),   # id 0
        (100, 1, "view"),    # id 1 — same second: NOT counted (>)
        (101, 1, "view"),    # id 2 — counted
        (160, 1, "view"),    # id 3 — exactly +60: counted (<=)
        (161, 1, "view"),    # id 4 — +61: not counted
        (130, 2, "view"),    # id 5 — other user: not counted
    ])
    got = rows(QUERIES["ev_range_join"](spark, sf))
    assert got == [(1, 0, BASE_EPOCH + 100, 2)]


def test_sequence_packing_bins_per_source(spark, tmp_path):
    # 2048-token budget; tokens = whitespace words. doc sizes 1500,
    # 1000, 600 in one source: doc1 starts at cum 1500 -> bin 0ical,
    # doc2 at cum 2500 -> bin 1; second source restarts at bin 0.
    sf = _docs_dir(spark, tmp_path, [
        ("a", "w " * 1499 + "w"),
        ("a", "w " * 999 + "w"),
        ("a", "w " * 599 + "w"),
        ("b", "w " * 9 + "w"),
    ])
    got = {
        (r["source"], r["bin_id"]):
            (r["n_docs"], r["total_tokens"], r["first_doc"], r["last_doc"])
        for r in QUERIES["txt_sequence_packing"](spark, sf).collect()
    }
    assert got == {
        ("a", 0): (2, 2500, 0, 1),   # docs 0+1 (cum_before 0, 1500)
        ("a", 1): (1, 600, 2, 2),    # doc 2 (cum_before 2500)
        ("b", 0): (1, 10, 3, 3),
    }


def test_boilerplate_chunks_flagged_at_three_docs(spark, tmp_path):
    boiler = "one two three four five six seven eight"
    uniq = ["u%d" % i for i in range(8)]
    sf = _docs_dir(spark, tmp_path, [
        ("a", boiler + " " + " ".join(uniq)),        # boiler + unique chunk
        ("a", boiler),                                # boiler only
        ("a", boiler),                                # boiler only
        ("a", "short doc under eight words"),         # no chunks -> absent
    ])
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_boiler_chunks"], r["boiler_frac"])
        for r in QUERIES["txt_boilerplate_passages"](spark, sf).collect()
    }
    assert got == {
        0: (2, 1, 0.5),
        1: (1, 1, 1.0),
        2: (1, 1, 1.0),
    }
