#!/usr/bin/env python3
"""Deterministic scale-ladder replica of the driver's synthetic schema
(TESTDATA.md tables), for the sf-ladder bench (r8 judge item #1: measure
the 100x scaling story instead of asserting it).

The driver's generator isn't published, so this reproduces the OBSERVED
distributions of `/root/testdata/sf*` (row-count scaling laws, value
ranges, per-column distributions — all measured with DuckDB and cited
inline) rather than its exact bytes.  Two consequences, both by design:

* absolute per-query times on a replica point are only comparable to
  other REPLICA points (constant factors can differ from the driver's
  data) — the ladder therefore fits scaling exponents on replica points
  only, and separately validates the replica's realism by timing the
  headline set on replica-sf0.1 vs driver-sf0.1;
* determinism is a fixed numpy seed per (table, sf), so re-runs are
  byte-stable.

Row-count laws measured from sf0.001/0.01/0.1 (all exact multiples):
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem ~ Poisson(4) lines per order (zeros dropped: 6M*sf expected),
  events 1M*sf over 15k*sf users, documents 50k*sf (floor 500),
  embeddings 20k*sf (floor 500); nation 25 / region 5 fixed.

Usage:  python tools/gen_scale_data.py SF OUT_DIR [table ...]
(e.g. ``1 /tmp/sfrep/sf1`` for everything, or ``10 /tmp/sfrep/sf10docs
documents`` for a targeted big point).  Small tables are single parquet
files; big tables are ``name.parquet/`` DIRECTORIES of part files (see
SHARD_ROWS) — Spark reads both layouts transparently.
NEVER writes under /root/testdata.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# p_name: 64 distinct "adj noun" pairs observed (8x8)
P_ADJ = ["large", "hot", "blue", "red", "small", "dark", "light", "round"]
P_NOUN = ["ring", "bolt", "screw", "nut", "plate", "rod", "gear", "pin"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
# documents: 31-word engine-salad vocab observed in the driver corpus
DOC_VOCAB = (
    "spark line column order small sort fast value scan a hash slow group "
    "batch part query agg table the key stream filter big merge join "
    "window customer vector sku state row"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]  # en ~41%, others ~15% each
DAY_US = 86_400_000_000


def _rng(table: str, sf: float) -> np.random.Generator:
    import zlib  # stable across processes (str hash is randomized)

    return np.random.default_rng([SEED, zlib.crc32(table.encode()),
                                  int(round(sf * 1000))])


def _ts_us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype(np.int64))


# Rows per output file for the big tables.  One monolithic file caps a
# Spark scan at ceil(bytes / maxPartitionBytes) tasks — the r10 sf10 run
# starved ann_pq_index_topk to 2-of-32 cores on a 55 MB single-file
# embeddings table (row groups alone do NOT help: Spark splits files by
# byte ranges of maxPartitionBytes, so any file under 128 MB is one
# task).  A directory of part files is both the layout every real
# multi-file dataset has AND what fans the scan out: with N files,
# Spark's dynamic split sizing (totalSize/defaultParallelism, capped at
# maxPartitionBytes) assigns ~one small file per task.  Shard sizes are
# chosen so the sf10 point yields >= 16 files for every table in the
# sf10 bench set (embeddings 200k/8k = 25, documents 500k/16k = 31,
# lineitem 60M/2M = 29, orders 15M/512k = 29, events 10M/512k = 20).
SHARD_ROWS = {
    "customer": 262_144,
    "part": 1_048_576,
    "orders": 524_288,
    "lineitem": 2_097_152,
    "events": 524_288,
    "documents": 16_384,
    "embeddings": 8_192,
}


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    shard_rows = SHARD_ROWS.get(name)
    if shard_rows is None or table.num_rows <= shard_rows:
        # small tables stay single-file; 64k row groups keep even those
        # splittable if they ever exceed maxPartitionBytes
        pq.write_table(table, path, row_group_size=65536)
        return
    if os.path.isfile(path):
        os.remove(path)  # replace an old single-file layout in place
    elif os.path.isdir(path):
        # a previous shard set may have MORE part files than this one
        # (smaller sf into the same OUT_DIR, or a future SHARD_ROWS
        # bump); Spark reads every part-*.parquet in the directory, so
        # stale shards would silently inflate row counts and corrupt
        # bench/exponent measurements.  Replace the whole set.
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    n_shards = -(-table.num_rows // shard_rows)
    for i in range(n_shards):
        pq.write_table(
            table.slice(i * shard_rows, shard_rows),
            os.path.join(path, f"part-{i:05d}.parquet"),
            row_group_size=65536,
        )


def _tscol(arr_us: np.ndarray) -> pa.Array:
    return pa.array(arr_us, type=pa.timestamp("us"))


def gen(sf: float, out_dir: str, tables: set[str] | None = None) -> dict:
    """Generate the replica tables.  ``tables`` restricts output to the
    named subset (dependencies respected: lineitem implies the orders
    arrays are computed; keys still span the full-scale ranges so a
    partial dir stays self-consistent for single-table probes)."""
    os.makedirs(out_dir, exist_ok=True)
    counts = {}

    def want(name: str) -> bool:
        return tables is None or name in tables

    if want("region"):
        _write(out_dir, "region", pa.table({
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        }))
        counts["region"] = 5
    if want("nation"):
        _write(out_dir, "nation", pa.table({
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        }))
        counts["nation"] = 25

    n_cust = int(150_000 * sf)
    r = _rng("customer", sf)
    if want("customer"):
        _write(out_dir, "customer", pa.table({
            "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(r.uniform(-1000, 10000, n_cust), 2),
            "c_mktsegment": pa.array(
                np.array(SEGMENTS)[r.integers(0, 5, n_cust)]),
        }))
        counts["customer"] = n_cust

    n_supp = int(10_000 * sf)
    r = _rng("supplier", sf)
    if want("supplier"):
        _write(out_dir, "supplier", pa.table({
            "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(r.uniform(-1000, 10000, n_supp), 2),
        }))
        counts["supplier"] = n_supp

    n_part = int(200_000 * sf)
    if want("part"):
        r = _rng("part", sf)
        adj = r.integers(0, 8, n_part)
        noun = r.integers(0, 8, n_part)
        _write(out_dir, "part", pa.table({
            "p_partkey": pa.array(np.arange(n_part), pa.int64()),
            "p_name": [f"{P_ADJ[a]} {P_NOUN[b]}"
                       for a, b in zip(adj, noun)],
            "p_brand": [f"Brand#{i}" for i in r.integers(1, 26, n_part)],
            "p_type": pa.array(np.array(PTYPES)[r.integers(0, 6, n_part)]),
            "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
            # observed: 900.0 + (key % 1000) / 10, range [900, 999.9]
            "p_retailprice": np.round(
                900.0 + (np.arange(n_part) % 1000) / 10.0, 2),
        }))
        counts["part"] = n_part

    if want("orders") or want("lineitem"):
        n_ord = int(1_500_000 * sf)
        r = _rng("orders", sf)
        d0, d1 = _ts_us("1995-01-01"), _ts_us("2001-08-02")
        odate = (d0 + (r.integers(0, (d1 - d0) // DAY_US, n_ord) * DAY_US))
        if want("orders"):
            _write(out_dir, "orders", pa.table({
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    r.integers(0, n_cust, n_ord), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[r.integers(0, 3, n_ord)]),
                "o_totalprice": np.round(r.uniform(1000, 500000, n_ord), 2),
                "o_orderdate": _tscol(odate),
                "o_orderpriority": pa.array(
                    np.array(PRIORITIES)[r.integers(0, 5, n_ord)]),
            }))
            counts["orders"] = n_ord

        if want("lineitem"):
            # lineitem: Poisson(4) lines per order, zero-line orders dropped
            r = _rng("lineitem", sf)
            per_order = r.poisson(4.0, n_ord)
            okeys = np.repeat(np.arange(n_ord), per_order)
            n_li = len(okeys)
            ship = (np.repeat(odate, per_order)
                    + r.integers(1, 96, n_li) * DAY_US)  # +1..95 days
            _write(out_dir, "lineitem", pa.table({
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(
                    r.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(
                    r.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(r.integers(1, 8, n_li), pa.int32()),
                "l_quantity": r.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(r.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(r.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(r.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": pa.array(
                    np.array(["R", "A", "N"])[r.integers(0, 3, n_li)]),
                "l_linestatus": pa.array(
                    np.array(["O", "F"])[r.integers(0, 2, n_li)]),
                "l_shipdate": _tscol(ship),
            }))
            counts["lineitem"] = n_li

    # events: 1M*sf rows over 15k*sf users, ts sorted over Jan 2024,
    # value ~ Exp(50) (measured avg 49.9 / median 34.8), props {"k":0..99}
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    if want("events"):
        r = _rng("events", sf)
        e0 = _ts_us("2024-01-01")
        ets = np.sort(e0 + r.integers(0, 30 * DAY_US, n_ev))
        _write(out_dir, "events", pa.table({
            "event_id": pa.array(np.arange(n_ev), pa.int64()),
            # driver writes events.ts as INT64 TIMESTAMP(NANOS) — match it
            # so the ladder exercises the same nanosAsLong ingest path
            "ts": pa.array(ets * 1000, type=pa.timestamp("ns")),
            "user_id": pa.array(r.integers(0, n_users, n_ev), pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[r.integers(0, 5, n_ev)]),
            "value": np.round(
                np.minimum(r.exponential(50.0, n_ev), 599.0), 2),
            "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n_ev)],
        }))
        counts["events"] = n_ev

    # documents: 50k*sf (floor 500), 31-word salad, ~0.16% exact dups,
    # lang en-heavy, 20 sources
    if want("documents"):
        n_doc = max(500, int(50_000 * sf))
        r = _rng("documents", sf)
        vocab = np.array(DOC_VOCAB)
        n_words = r.integers(8, 101, n_doc)
        texts: list[str] = []
        for i in range(n_doc):
            if i > 0 and i % 600 == 599:  # exact-dup seam for dedup
                texts.append(texts[i - 1])
                continue
            texts.append(
                " ".join(vocab[r.integers(0, len(vocab), n_words[i])]))
        lang_idx = r.choice(
            5, n_doc, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
        _write(out_dir, "documents", pa.table({
            "doc_id": pa.array(np.arange(n_doc), pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[lang_idx]),
            "source": [f"src{s}" for s in r.integers(0, 20, n_doc)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }))
        counts["documents"] = n_doc

    # embeddings: 20k*sf (floor 500), 64-dim unit vectors around 10
    # label centroids (the cluster structure the ANN/SemDeDup ops use)
    if want("embeddings"):
        n_emb = max(500, int(20_000 * sf))
        r = _rng("embeddings", sf)
        cents = r.normal(0, 1, (10, 64))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        labels = r.integers(0, 10, n_emb)
        vecs = cents[labels] + r.normal(0, 0.35, (n_emb, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        _write(out_dir, "embeddings", pa.table({
            "vec_id": pa.array(np.arange(n_emb), pa.int64()),
            "embedding": pa.array(
                vecs.astype(np.float32).tolist(),
                pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }))
        counts["embeddings"] = n_emb
    return counts


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    tables = set(sys.argv[3:]) or None
    real = os.path.realpath(out_dir)
    if real.startswith("/root/testdata"):
        raise SystemExit("refusing to write under /root/testdata")
    counts = gen(sf, out_dir, tables)
    print(json.dumps({"sf": sf, "out_dir": out_dir, "rows": counts}))


if __name__ == "__main__":
    main()
