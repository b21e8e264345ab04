"""Generate tests/plan_pins.json: static shuffle/broadcast exchange
counts for every bench.py headline query, at each fixture SF the
counts will be checked against.

Usage:
    python scripts/gen_plan_pins.py [sf_dir ...]

Defaults to the test SF (sf0.001) and the bench SF (sf0.1). Counting
is identical to bench.py plan_stats: `Exchange` occurrences in the
pre-AQE executedPlan string, split into shuffle vs broadcast. Run this
ONLY after a deliberate plan change, review the diff, and commit the
regenerated pins alongside the change — tests/test_plan_shapes.py
fails on any drift otherwise.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from stream_ingestion_amazon_kinesis_spark.plans.registry import (
    EXTRA_PLAN_BUILDERS,
    QUERIES,
    _load_all,
)
from stream_ingestion_amazon_kinesis_spark.session import get_spark


def plan_counts(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_broadcast = plan.count("BroadcastExchange")
    return {
        "shuffles": plan.count("Exchange") - n_broadcast,
        "broadcasts": n_broadcast,
    }


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
    _load_all()
    spark = get_spark("gen-plan-pins")
    pins: dict[str, dict[str, dict[str, int]]] = {}
    for sf_dir in sf_dirs:
        sf_key = os.path.basename(os.path.normpath(sf_dir))
        builders = {name: QUERIES[name].fn for name in HEADLINE}
        # Pre-checkpoint intermediate plans (`query::stage`) are pinned
        # too — the eager localCheckpoints in those operators would
        # otherwise hide their real shapes (verdict r9 #2).
        builders.update(EXTRA_PLAN_BUILDERS)
        for name, fn in builders.items():
            df = fn(spark, sf_dir)
            pins.setdefault(name, {})[sf_key] = plan_counts(df)
            print(f"{sf_key} {name}: {pins[name][sf_key]}")
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "plan_pins.json",
    )
    with open(out, "w") as f:
        json.dump(pins, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out} ({len(pins)} queries x {len(sf_dirs)} SFs)")


if __name__ == "__main__":
    main()
