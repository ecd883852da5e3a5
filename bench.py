#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--scaling` additionally re-runs the flagship KG pipeline at local[8]
and local[32] in fresh subprocesses and reports throughput at both plus
the scaling efficiency T32/(4·T8) (the sandbox proxy for the N-vs-4N
executor criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_kg_pipeline(spark, sf_dir: str) -> dict:
    """Full pages → extraction → CDCR → nodes/edges run; returns counts."""
    from anno_spark.operators import extract as ex
    from anno_spark.operators import graph as g
    from anno_spark.operators import resolve as rx
    from anno_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    extracted = ex.extract_documents(pages).persist()
    mentions = ex.mentions_table(extracted)
    triples = ex.triples_table(extracted).persist()
    n_pages = extracted.count()
    n_triples = triples.count()
    keyed, idents, _ = rx.resolve_mentions(mentions)
    nodes = g.nodes_table(idents)
    keyed_surfaces = keyed.selectExpr(
        "surface", "entity_type", "component_id as identity_id"
    )
    edges = g.edges_table(triples, keyed_surfaces, nodes)
    n_nodes, n_edges = nodes.count(), edges.count()
    extracted.unpersist()
    triples.unpersist()
    return {
        "pages": n_pages,
        "triples": n_triples,
        "nodes": n_nodes,
        "edges": n_edges,
    }


HEADLINE = (
    "dedup_exact",
    "dedup_minhash",
    "ann_cosine_topk",
    "doc_stats",
    "rel_agg_lineitem",
    "rel_broadcast_region_sales",
    "events_hourly",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from anno_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    timings: dict[str, float] = {}

    t0 = time.monotonic()
    stats = run_kg_pipeline(spark, sf_dir)
    timings["kg_pipeline"] = round(time.monotonic() - t0, 3)

    qmap = entry_mod.queries()
    for name in HEADLINE:
        t0 = time.monotonic()
        n = qmap[name](spark, sf_dir).count()
        timings[name] = round(time.monotonic() - t0, 3)
        stats[f"{name}_rows"] = n

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(sf_dir),
        "kg_pages": stats["pages"],
        "kg_triples": stats["triples"],
        "kg_nodes": stats["nodes"],
        "kg_edges": stats["edges"],
        "pages_per_sec": round(stats["pages"] / timings["kg_pipeline"], 2),
        "triples_per_sec": round(stats["triples"] / timings["kg_pipeline"], 2),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


def scaling() -> None:
    """Run the KG pipeline at local[8] and local[32]; print both
    throughputs and the scaling efficiency."""
    import subprocess

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (8, 32):
        code = (
            "import json, time, os; "
            "from anno_spark.session import get_spark; "
            "from bench import run_kg_pipeline; "
            f"spark = get_spark(master='local[{cpus}]', shuffle_partitions={cpus}); "
            "t0 = time.monotonic(); "
            f"stats = run_kg_pipeline(spark, {sf_dir!r}); "
            "dt = time.monotonic() - t0; spark.stop(); "
            "print('RESULT ' + json.dumps({'sec': dt, **stats}))"
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"scaling run at {cpus} cpus failed")
        results[cpus] = json.loads(line[-1][len("RESULT "):])

    t8, t32 = results[8]["sec"], results[32]["sec"]
    pages = results[32]["pages"]
    thr8, thr32 = pages / t8, pages / t32
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(thr32 / (4 * thr8), 4),
        "unit": "ratio",
        "sf": _sf_label(sf_dir),
        "pages": pages,
        "sec_at_8": round(t8, 3),
        "sec_at_32": round(t32, 3),
        "pages_per_sec_at_8": round(thr8, 2),
        "pages_per_sec_at_32": round(thr32, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
