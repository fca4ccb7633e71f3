#!/usr/bin/env python
"""Generate a statistically-faithful scale replica of the driver testdata.

The driver generates its own sf1.0 tables for the round-end measurement and
removes them afterwards; this script rebuilds a *replica* at an arbitrary
scale multiple so optimization A/Bs can be run at measurement scale between
driver rounds.  It is fitted to /root/testdata/sf0.1 (read-only input):

- documents: empirical 31-word unigram distribution, doc length ~ U(10,100)
  tokens, ~5.1% of docs planted as drop-last-token near-copies of a random
  earlier doc (reproduces the inter/union=n-1/n ngram pair pattern observed
  in the real data), ~0.16% exact copies; lang/source sampled from the
  empirical marginals (text is lang-independent in the real data too).
- events: ts monotone over 30 days (corr(event_id, ts) = 0.99999 in the
  real data), user_id uniform over 1500*mult users, 5 uniform event types,
  value ~ Exp(50) rounded to cents (matches observed quantiles), props JSON
  {"k": U(0,99)}.
- embeddings: 64-dim i.i.d. Gaussian unit vectors (the real table has no
  planted near-dup pairs: max off-diagonal cosine 0.60 at sf0.1), labels
  uniform 0..9 (centroid offsets in the real data are pure sample noise).
- TPC tables (customer/supplier/part/orders/lineitem): key-offset
  replication of the sf0.1 rows mult times — preserves every column
  distribution and the FK fan-outs exactly; region/nation copied as-is
  (fixed-size dimensions).

Row counts at mult=10 match the driver's sf1.0 (verified against the row
counts recorded in BENCH_r05.json).  This data is for self-measurement
only: bench evidence from it is labeled sf1.0rep in OPTIMIZATION_r06.md /
BENCH notes, never passed off as driver data.

Usage: python scripts/make_scale_replica.py [--mult 10] [--out /root/testdata_replica/sf1.0rep]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def gen_documents(rng: np.random.Generator, n_docs: int) -> pa.Table:
    src = _read("documents")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()
    sources = src.column("source").to_pylist()
    # empirical unigram distribution
    from collections import Counter

    cnt: Counter[str] = Counter()
    for t in texts:
        cnt.update(t.split(" "))
    vocab = sorted(cnt)
    probs = np.array([cnt[w] for w in vocab], dtype=np.float64)
    probs /= probs.sum()
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    src_vals = sorted(set(sources))

    near_rate = 256 / 5000.0  # ngram J>=1/2 pairs per doc in the real sf0.1
    exact_rate = 8 / 5000.0

    out_texts: list[str] = []
    varr = np.array(vocab)
    lens = rng.integers(10, 101, size=n_docs)
    for i in range(n_docs):
        u = rng.random()
        if i > 10 and u < exact_rate:
            out_texts.append(out_texts[rng.integers(0, i)])
        elif i > 10 and u < exact_rate + near_rate:
            donor = out_texts[rng.integers(0, i)].split(" ")
            if len(donor) > 10:
                donor = donor[:-1]  # drop-last: symmetric gram diff of 1
            out_texts.append(" ".join(donor))
        else:
            toks = varr[rng.choice(len(varr), size=lens[i], p=probs)]
            out_texts.append(" ".join(toks))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(rng.choice(lang_vals, size=n_docs, p=lang_p), pa.string()),
            "source": pa.array(
                [src_vals[j] for j in rng.integers(0, len(src_vals), size=n_docs)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
        }
    )


def gen_events(rng: np.random.Generator, mult: int) -> pa.Table:
    n = 100_000 * mult
    n_users = 1500 * mult
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    offs = np.sort(rng.integers(0, span_us, size=n))
    types = np.array(["signup", "click", "error", "view", "purchase"])
    value = np.round(rng.exponential(50.0, size=n), 2)
    k = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(base + offs.astype("timedelta64[us]")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            "value": pa.array(value, pa.float64()),
            "props": pa.array([f'{{"k": {int(x)}}}' for x in k], pa.string()),
        }
    )


def gen_embeddings(rng: np.random.Generator, mult: int) -> pa.Table:
    n = 2000 * mult
    m = rng.standard_normal((n, 64)).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), pa.int64()),
        }
    )


def replicate_keyed(name: str, mult: int, key_offsets: dict[str, int]) -> pa.Table:
    """mult copies with per-copy key offsets (FK structure preserved)."""
    src = _read(name)
    chunks = []
    for i in range(mult):
        cols = {}
        for col in src.column_names:
            arr = src.column(col)
            if col in key_offsets:
                cols[col] = pa.array(
                    np.asarray(arr.to_numpy(zero_copy_only=False)) + i * key_offsets[col]
                )
            else:
                cols[col] = arr.combine_chunks()
        chunks.append(pa.table(cols))
    return pa.concat_tables(chunks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/root/testdata_replica/sf1.0rep")
    ap.add_argument("--seed", type=int, default=20260822)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    pq.write_table(gen_documents(rng, 5000 * args.mult), f"{args.out}/documents.parquet")
    pq.write_table(gen_events(rng, args.mult), f"{args.out}/events.parquet")
    pq.write_table(gen_embeddings(rng, args.mult), f"{args.out}/embeddings.parquet")
    for name in ("region", "nation"):
        pq.write_table(_read(name), f"{args.out}/{name}.parquet")
    pq.write_table(
        replicate_keyed("customer", args.mult, {"c_custkey": 15000}),
        f"{args.out}/customer.parquet",
    )
    pq.write_table(
        replicate_keyed("supplier", args.mult, {"s_suppkey": 1000}),
        f"{args.out}/supplier.parquet",
    )
    pq.write_table(
        replicate_keyed("part", args.mult, {"p_partkey": 20000}),
        f"{args.out}/part.parquet",
    )
    pq.write_table(
        replicate_keyed(
            "orders", args.mult, {"o_orderkey": 150000, "o_custkey": 15000}
        ),
        f"{args.out}/orders.parquet",
    )
    pq.write_table(
        replicate_keyed(
            "lineitem",
            args.mult,
            {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
        ),
        f"{args.out}/lineitem.parquet",
    )
    meta = {"mult": args.mult, "seed": args.seed, "source": SRC}
    with open(f"{args.out}/_REPLICA.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
