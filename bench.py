"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "headline_wall", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <scale factor>}

Each query is timed over a full .collect() (materialize everything,
same as the correctness gate). A trivial warm-up query absorbs the
one-time session/codegen startup so per-query numbers reflect plan
cost, not JVM warm-up.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metadata_wrangler_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The headline set: the engine's heaviest / most representative plans,
# one per operator family (dedup, similarity, closure, windowed
# events, joins, aggregation, fuzzy matching).
HEADLINE = [
    "a_pricing_summary",
    "j_fk_inner_join",
    "w_topk_per_group",
    "f_levenshtein_ratio",
    "f_title_token_jaccard",
    "dd_exact_groups",
    "dd_ngram_jaccard",
    "dd_minhash_lsh",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "ev_tumbling_window",
    "ev_sessionized_gaps",
    "g_transitive_closure",
    "g_connected_components",
    "sim_lsh_multitable_topk",
    "d_queue_lifecycle",
    "s_xml_classify",
    "pipe_provider_end_to_end",
    "dd_embedding_cosine",
    "dd_minhash_clusters",
    "dd_decontaminate",
    "txt_repetition_filter",
]


def main() -> int:
    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark = get_spark("bench")

    # Warm-up: a tiny scan so session startup / first-job overhead is
    # not attributed to the first timed query, plus a one-row Arrow
    # round-trip so Python-worker spawn isn't charged to the first
    # mapInPandas query.
    region = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    region.count()
    region.limit(1).mapInPandas(lambda it: it, schema=region.schema).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.time()
        fn(spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf_name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = sf_name
    print(json.dumps({
        "metric": "headline_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
