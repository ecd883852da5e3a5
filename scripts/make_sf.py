#!/usr/bin/env python
"""Synthesize a benchmark dataset at an arbitrary scale factor, shaped
like the driver-generated /root/testdata/sf* tables (same schemas, same
distributions: 30-word vocab documents with ~5% planted near-dup pairs,
unit-norm 64-dim embeddings, TPC-H-ish star schema, an events stream).

LOCAL MEASUREMENT ONLY: the driver generates its own data; this script
exists so optimization rounds can measure at the driver's sf1.0 scale
(BENCH_r05 "sf": 1.0) without access to the driver's generator. It is
NOT byte-identical to the driver's data — row counts and distributions
match, seeds/bytes do not.

    python scripts/make_sf.py --sf 1.0 --out /tmp/sfgen/sf1.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en ~2x the others
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
P_NAMES1 = ["large", "hot", "small", "cold", "dim", "bright"]
P_NAMES2 = ["ring", "bolt", "screw", "nut", "washer", "plate"]
P_TYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
SEGMENTS = ["FURNITURE", "MACHINERY", "BUILDING", "AUTOMOBILE", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    n_base = n - n // 20          # ~5% near-dup variants
    lens = rng.integers(10, 101, size=n_base)
    texts = [
        " ".join(rng.choice(VOCAB, size=ln).tolist()) for ln in lens
    ]
    # near-dup variants: mutate the tail of a base doc, append ' dup'
    for _ in range(n - n_base):
        base = texts[int(rng.integers(0, n_base))]
        words = base.split(" ")
        cut = max(1, int(len(words) * float(rng.uniform(0.6, 0.98))))
        texts.append(" ".join(words[:cut]) + " dup")
    langs = [LANGS[int(i)] for i in rng.integers(0, len(LANGS), size=n)]
    sources = [f"src{int(i) % 20}" for i in rng.integers(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, n: int, dim: int = 64) -> pa.Table:
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(v), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
        }
    )


def gen_events(rng: np.random.Generator, n: int) -> pa.Table:
    span = 30 * 86400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = np.sort(rng.uniform(0, span, size=n)) * 1e6
    ts = base + offs.astype("timedelta64[us]")
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, 1500, size=n), pa.int64()),
            "event_type": pa.array(
                [EVENT_TYPES[int(i)] for i in rng.integers(0, 5, size=n)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2)),
            "props": pa.array(
                [f'{{"k": {int(i)}}}' for i in rng.integers(0, 100, size=n)]
            ),
        }
    )


def _dates(rng, n, lo="1995-01-01", hi="2002-01-01"):
    a = np.datetime64(lo)
    days = (np.datetime64(hi) - a).astype(int)
    return a + rng.integers(0, days, size=n).astype("timedelta64[D]")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    sf = args.sf
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    n_doc = max(500, int(sf * 50_000))
    n_emb = max(500, int(sf * 20_000))
    n_ev = max(1000, int(sf * 1_000_000))
    n_li = int(sf * 6_000_000)
    n_ord = int(sf * 1_500_000)
    n_cust = int(sf * 150_000)
    n_part = int(sf * 200_000)
    n_supp = max(100, int(sf * 10_000))

    _write(args.out, "documents", gen_documents(rng, n_doc))
    _write(args.out, "embeddings", gen_embeddings(rng, n_emb))
    _write(args.out, "events", gen_events(rng, n_ev))

    _write(
        args.out,
        "region",
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(REGIONS),
            }
        ),
    )
    _write(
        args.out,
        "nation",
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
            }
        ),
    )
    _write(
        args.out,
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, size=n_supp), pa.int32()
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999, 9999, size=n_supp), 2)
                ),
            }
        ),
    )
    _write(
        args.out,
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, size=n_cust), pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999, 9999, size=n_cust), 2)
                ),
                "c_mktsegment": pa.array(
                    [SEGMENTS[int(i)] for i in rng.integers(0, 5, size=n_cust)]
                ),
            }
        ),
    )
    _write(
        args.out,
        "part",
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{P_NAMES1[int(a)]} {P_NAMES2[int(b)]}"
                        for a, b in zip(
                            rng.integers(0, 6, size=n_part),
                            rng.integers(0, 6, size=n_part),
                        )
                    ]
                ),
                "p_brand": pa.array(
                    [f"Brand#{int(i)}" for i in rng.integers(1, 26, size=n_part)]
                ),
                "p_type": pa.array(
                    [P_TYPES[int(i)] for i in rng.integers(0, 6, size=n_part)]
                ),
                "p_size": pa.array(rng.integers(1, 51, size=n_part), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(900 + rng.uniform(0, 1200, size=n_part), 2)
                ),
            }
        ),
    )
    _write(
        args.out,
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    ["OFP"[int(i)] for i in rng.integers(0, 3, size=n_ord)]
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500_000, size=n_ord), 2)
                ),
                "o_orderdate": pa.array(
                    _dates(rng, n_ord).astype("datetime64[us]"), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [PRIORITIES[int(i)] for i in rng.integers(0, 5, size=n_ord)]
                ),
            }
        ),
    )
    _write(
        args.out,
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li), pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
                "l_linenumber": pa.array(rng.integers(1, 8, size=n_li), pa.int32()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, size=n_li).astype(float)
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(1000, 100_000, size=n_li), 2)
                ),
                "l_discount": pa.array(
                    np.round(rng.integers(0, 11, size=n_li) / 100.0, 2)
                ),
                "l_tax": pa.array(np.round(rng.integers(0, 9, size=n_li) / 100.0, 2)),
                "l_returnflag": pa.array(
                    ["RAN"[int(i)] for i in rng.integers(0, 3, size=n_li)]
                ),
                "l_linestatus": pa.array(
                    ["OF"[int(i)] for i in rng.integers(0, 2, size=n_li)]
                ),
                "l_shipdate": pa.array(
                    _dates(rng, n_li).astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        ),
    )
    open(os.path.join(args.out, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
