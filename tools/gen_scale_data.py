"""Scale-rehearsal data generator (VERDICT r4 next-round item 1).

Mirrors the driver's synthetic TPC-H-ish tables (TESTDATA.md; schemas and
distributions profiled from /root/testdata/sf0.1 — seed-exact parity is NOT
the goal, statistical shape is: per-order line counts ~ Poisson(4.07)|>=1,
31-word document vocab with 10-100 word docs, unit-norm 64-dim embeddings,
uniform user activity) at 10x the driver's largest SF, plus a Zipf-skewed
variant of the hot-key tables (events.user_id, documents near-dup clusters)
to rehearse skew behavior.

Outputs (gitignored — ~500 MB):
    scaledata/sf1/{region,nation,customer,supplier,part,orders,lineitem,
                   events,documents,embeddings}.parquet      (10x sf0.1)
    scaledata/sf1zipf/{events,documents}.parquet             (skewed variant)

Usage: python tools/gen_scale_data.py [out_root] [--sf N]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "vector", "window", "value", "join", "data", "small", "column", "part",
    "big", "order", "filter", "query", "merge", "fast", "customer", "slow",
    "line", "agg", "sort", "group", "row", "hash", "spark", "scan", "batch",
    "the", "stream", "a", "key", "table", "index",
]
SEGMENTS = ["FURNITURE", "BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_NAMES_A = ["large", "hot", "blue", "red", "small", "green", "cold", "dim"]
P_NAMES_B = ["ring", "bolt", "gear", "rod", "tube", "plate", "cap", "pin"]
P_TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path, compression="snappy")
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _ts_us(days_from, spread_days, rng, n, epoch_day):
    us = (
        (epoch_day + days_from) * DAY_US
        + (rng.random(n) * spread_days * DAY_US).astype(np.int64)
    )
    return pa.array(us, type=pa.timestamp("us"))


def gen_dims(out_dir: str, sf: float, rng: np.random.Generator) -> None:
    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    n_cust = int(150_000 * sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    n_supp = int(10_000 * sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.0, 9999.0, n_supp), 2),
    }))
    n_part = int(200_000 * sf)
    a = np.array(P_NAMES_A)[rng.integers(0, len(P_NAMES_A), n_part)]
    b = np.array(P_NAMES_B)[rng.integers(0, len(P_NAMES_B), n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{x} {y}" for x, y in zip(a, b)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, len(P_TYPES), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2100.0, n_part), 2),
    }))


def gen_facts(out_dir: str, sf: float, rng: np.random.Generator) -> None:
    n_orders = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    epoch_1995 = 9131  # days 1970-01-01 -> 1995-01-01
    o_days = rng.integers(0, 2405, n_orders)  # ~1995-01-01 .. 2001-08-01
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]),
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_orders), 2),
        "o_orderdate": pa.array((epoch_1995 + o_days) * DAY_US, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_orders)]),
    }))

    # lineitem: lines per order ~ Poisson(4.075) conditioned >= 1 (profiled)
    lines = rng.poisson(4.075, n_orders)
    lines = np.maximum(lines, 1)
    n_li = int(lines.sum())
    okey = np.repeat(np.arange(n_orders), lines)
    linenum = (
        np.arange(n_li) - np.repeat(np.cumsum(lines) - lines, lines) + 1
    ).astype(np.int32)
    ship_lag = rng.integers(1, 96, n_li)  # ship 1..95 days after order
    ship_us = (epoch_1995 + np.repeat(o_days, lines) + ship_lag) * DAY_US
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
    }))


def gen_events(
    out_dir: str, sf: float, rng: np.random.Generator, zipf: bool = False
) -> None:
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    if zipf:
        # Zipf(1.3) rank-frequency over the user id space: the hot-key
        # rehearsal — top user takes ~2-4% of ALL events, top-10 ~15%.
        ranks = rng.zipf(1.3, n_ev * 2)
        ranks = ranks[ranks <= n_users][:n_ev]
        # deterministic rank->user scramble so hot users aren't id 1,2,3
        user = ((ranks * 2654435761) % n_users).astype(np.int64)
    else:
        user = rng.integers(0, n_users, n_ev)
    epoch_2024 = 19723  # days 1970-01-01 -> 2024-01-01
    ts = epoch_2024 * DAY_US + (rng.random(n_ev) * 30 * DAY_US).astype(np.int64)
    ts.sort()
    k = rng.integers(0, 100, n_ev)
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(user, pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array([f'{{"k": {v}}}' for v in k]),
    }))


def gen_documents(
    out_dir: str, sf: float, rng: np.random.Generator, zipf: bool = False
) -> None:
    n_docs = int(50_000 * sf)
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_docs)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    if zipf:
        # hot near-dup clusters: 50 template docs duplicated with Zipf
        # weights (exact + 1-word-mutated copies) over ~20% of the corpus —
        # the LSH band-key / gram-key skew rehearsal.
        n_hot = n_docs // 5
        t_ranks = rng.zipf(1.2, n_hot * 3)
        t_ranks = t_ranks[t_ranks <= 50][:n_hot]
        for i, r in enumerate(t_ranks):
            base = texts[int(r)].split()
            if i % 2 == 1:  # near-dup: mutate one word
                base[int(rng.integers(0, len(base)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))]
                )
            texts[n_docs - n_hot + i] = " ".join(base)
    else:
        # light natural duplication (profiled: ~0.16% exact dups at sf0.1)
        n_dup = max(1, n_docs // 625)
        src = rng.integers(0, n_docs, n_dup)
        dst = rng.integers(0, n_docs, n_dup)
        for s, d in zip(src, dst):
            texts[int(d)] = texts[int(s)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n_docs),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))


def gen_embeddings(out_dir: str, sf: float, rng: np.random.Generator) -> None:
    n_vec = int(20_000 * sf)
    x = rng.standard_normal((n_vec, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(x), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_vec), pa.int32()),
    }))


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "scaledata"
    sf = 1.0
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])
    main_dir = os.path.join(out_root, f"sf{sf:g}")
    zipf_dir = os.path.join(out_root, f"sf{sf:g}zipf")
    os.makedirs(main_dir, exist_ok=True)
    os.makedirs(zipf_dir, exist_ok=True)

    rng = np.random.default_rng(42)
    print(f"generating sf{sf:g} -> {main_dir}")
    gen_dims(main_dir, sf, rng)
    gen_facts(main_dir, sf, rng)
    gen_events(main_dir, sf, rng)
    gen_documents(main_dir, sf, rng)
    gen_embeddings(main_dir, sf, rng)

    print(f"generating zipf variant -> {zipf_dir}")
    rng2 = np.random.default_rng(4242)
    gen_events(zipf_dir, sf, rng2, zipf=True)
    gen_documents(zipf_dir, sf, rng2, zipf=True)


if __name__ == "__main__":
    main()
