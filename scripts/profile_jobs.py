#!/usr/bin/env python
"""Per-job wall/CPU breakdown for one bench query (measurement aid,
not part of the bench contract): runs the query once warm with the
event log on, then prints every Spark job in the timed run with its
wall duration, executor CPU time, shuffle bytes and the first line of
its call site — the data needed to attribute fixed-latency overhead
vs real work at local[32].

    python scripts/profile_jobs.py kg_pipeline [--sf DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVLOG_DIR = "/tmp/anno-spark-evlog-profile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    shutil.rmtree(EVLOG_DIR, ignore_errors=True)
    os.makedirs(EVLOG_DIR, exist_ok=True)

    from anno_spark.session import get_spark

    import __spark_entry__ as entry_mod
    from bench import HEADLINE, _bench_dedup_minhash, _warmup, run_kg_pipeline

    spark = get_spark(
        master=f"local[{args.cpus}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVLOG_DIR,
            "spark.eventLog.compress": "false",
        },
    )
    sc = spark.sparkContext

    def run_once():
        if args.query == "kg_pipeline":
            run_kg_pipeline(spark, args.sf)
        else:
            qmap = entry_mod.queries()
            qmap["dedup_minhash"] = _bench_dedup_minhash
            qmap["doc_stats"] = entry_mod.q_doc_stats
            qmap[args.query](spark, args.sf).count()

    sc.setJobGroup("warmup", "warmup")
    _warmup(spark)
    if not args.no_warm:
        sc.setJobGroup("prewarm", "prewarm run")
        run_once()
    sc.setJobGroup("timed", "timed run")
    t0 = time.monotonic()
    run_once()
    wall = time.monotonic() - t0
    spark.stop()

    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    for fn in sorted(glob.glob(os.path.join(EVLOG_DIR, "*"))):
        if os.path.isdir(fn):
            sub = glob.glob(os.path.join(fn, "events_*"))
            fn = sub[0] if sub else None
        if not fn or not os.path.isfile(fn):
            continue
        for line in open(fn):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                props = e.get("Properties", {})
                if props.get("spark.jobGroup.id") != "timed":
                    continue
                jid = e["Job ID"]
                jobs[jid] = {
                    "t0": e["Submission Time"],
                    "site": props.get("callSite.short", ""),
                    "desc": (props.get("spark.job.description") or "")[:60],
                    "cpu_ns": 0,
                    "sh_rw": 0,
                    "tasks": 0,
                    "stages": e.get("Stage IDs", []),
                }
                for sid in e.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif ev == "SparkListenerJobEnd":
                jid = e["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerTaskEnd":
                jid = stage_job.get(e.get("Stage ID"))
                if jid in jobs:
                    m = e.get("Task Metrics") or {}
                    jobs[jid]["cpu_ns"] += m.get("Executor CPU Time", 0)
                    srm = m.get("Shuffle Read Metrics") or {}
                    swm = m.get("Shuffle Write Metrics") or {}
                    jobs[jid]["sh_rw"] += (
                        srm.get("Remote Bytes Read", 0)
                        + srm.get("Local Bytes Read", 0)
                        + swm.get("Shuffle Bytes Written", 0)
                    )
                    jobs[jid]["tasks"] += 1

    print(f"\n=== {args.query} @ {args.sf}: wall {wall:.3f}s, {len(jobs)} jobs ===")
    total_gap = None
    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000.0
        gap = (j["t0"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j.get("t1", j["t0"])
        print(
            f"job {jid:4d}  wall {dur:7.3f}s  gap {gap:7.3f}s  "
            f"cpu {j['cpu_ns'] / 1e9:7.2f}s  tasks {j['tasks']:4d}  "
            f"shfl {j['sh_rw'] / 2**20:8.2f}MB  {j['site']}  | {j['desc']}"
        )


if __name__ == "__main__":
    main()
