"""Physical-plan audit across every queries() entry.

Prints one row per query with the scale-relevant plan properties:

  CART   CartesianProduct anywhere (never acceptable)
  1PART  a window/sort over SinglePartition (global serialization)
  PYEVAL row-at-a-time Python eval (BatchEvalPython) outside the
         declared Arrow stages
  NOPUSH scan with a Filter parent but empty PushedFilters

Usage:  python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARROW_OK = {
    "mm_binary_features", "mm_image_features", "mm_frame_sample",
    "s_cached_fetch", "s_soap_demand", "pipe_provider_end_to_end",
}


def main() -> int:
    from metadata_wrangler_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)]

    import __spark_entry__ as entry
    qs = entry.queries()
    if names:
        qs = {k: v for k, v in qs.items() if k in names}

    spark = get_spark("plan_audit")
    flagged = 0
    for name, fn in sorted(qs.items()):
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:   # noqa: BLE001 — audit must not die mid-list
            print(f"ERR   {name}: {type(exc).__name__}")
            flagged += 1
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CART")
        if "SinglePartition" in plan and (
            "Window" in plan or "Sort " in plan
        ):
            # global LIMIT/collect tails are fine; a windowed/sorted
            # SinglePartition in the body is the scale-killer
            for line in plan.splitlines():
                if "SinglePartition" in line and "Window" in line:
                    flags.append("1PART")
                    break
        if ("BatchEvalPython" in plan) and name not in ARROW_OK:
            flags.append("PYEVAL")
        status = ",".join(flags) if flags else "ok"
        if flags:
            flagged += 1
        print(f"{status:6s} {name}")
    print(f"\n{flagged} flagged / {len(qs)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
