#!/usr/bin/env python
"""Host-independent plan audit: Spark JOB COUNT per headline bench query.

Wall-clock on this sandbox jitters 3-6x run-to-run (BASELINE.md round-5
host-state finding), but the number of jobs a query schedules is a pure
function of the plan — it cannot be inflated by a noisy neighbor. The
r04 perf work landed at 30 jobs for the full bench sweep; this script
re-measures after any plan change:

    python scripts/job_audit.py [--sf /root/testdata/sf0.1]

Each query runs once inside its own job group; job ids are read back
from the status tracker. Warmup jobs are grouped separately and not
counted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from anno_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from bench import HEADLINE, _bench_dedup_minhash, _warmup, run_kg_pipeline

    spark = get_spark(master=f"local[{args.cpus}]", shuffle_partitions=32)
    sc = spark.sparkContext

    sc.setJobGroup("warmup", "untimed warmup")
    _warmup(spark)

    counts: dict[str, int] = {}

    sc.setJobGroup("kg_pipeline", "kg_pipeline")
    run_kg_pipeline(spark, args.sf)
    counts["kg_pipeline"] = len(sc.statusTracker().getJobIdsForGroup("kg_pipeline"))

    qmap = entry_mod.queries()
    qmap["dedup_minhash"] = _bench_dedup_minhash
    qmap["doc_stats"] = entry_mod.q_doc_stats
    for name in HEADLINE:
        sc.setJobGroup(name, name)
        qmap[name](spark, args.sf).count()
        counts[name] = len(sc.statusTracker().getJobIdsForGroup(name))

    total = sum(counts.values())
    print(json.dumps({"metric": "bench_job_count", "value": total, "jobs": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
