"""Generate scale-SF synthetic documents/embeddings/events parquet
tables with the driver testdata's schemas and distribution shape
(TESTDATA.md; sampled from /root/testdata/sf0.1 — small word-salad
vocabulary, en-dominant language mix, ~20 sources, near-dup and
exact-dup injection, 10 gaussian embedding clusters in 64-dim, one
month of events). Used by the sf1 scale probe (VERDICT r14 directive
4): the driver's own testdata is read-only and stops at sf0.1, so
100x-design claims above 600k rows need locally generated volume.

Deterministic (seed fixed per sf). Usage:
    python tools/gen_sf.py <sf> <out_dir>
The row counts scale linearly from the driver's sf0.1 shape
(documents 50k/sf, embeddings 20k/sf, events 1M/sf).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark table scan query filter join group agg sort hash line "
    "column order part value key stream window batch vector fast "
    "slow small the a customer supplier region nation segment "
    "index merge commit shard token"
).split()

LANGS = [("en", 0.70), ("zh", 0.08), ("de", 0.06), ("fr", 0.06),
         ("es", 0.05), ("ja", 0.05)]
EVENT_TYPES = ["click", "view", "signup", "error", "purchase"]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    langs: list[str] = []
    sources: list[str] = []
    lang_names = [l for l, _ in LANGS]
    lang_p = np.array([p for _, p in LANGS])
    lang_p = lang_p / lang_p.sum()
    for i in range(n):
        if texts and rng.random() < 0.05:
            # near-dup: perturb an earlier doc (drives the minhash/
            # jaccard/simhash pair volume like the driver data does)
            base = texts[int(rng.integers(0, len(texts)))].split()
            k = max(1, len(base) // 12)
            for _ in range(k):
                base[int(rng.integers(0, len(base)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))]
            t = " ".join(base)
        elif texts and rng.random() < 0.002:
            t = texts[int(rng.integers(0, len(texts)))]  # exact dup
        else:
            ln = int(rng.integers(8, 70))
            t = " ".join(
                VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), ln))
        texts.append(t)
        langs.append(lang_names[int(rng.choice(len(lang_names),
                                               p=lang_p))])
        sources.append(f"src{int(rng.integers(0, 20))}")
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    dim, k = 64, 10
    centers = rng.normal(0, 1.0, (k, dim))
    labels = rng.integers(0, k, n)
    vecs = (centers[labels] +
            rng.normal(0, 0.35, (n, dim))).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32), pa.int32()),
    })


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 86400 * 1_000_000
    ts = t0 + rng.integers(0, span_us, n).astype("timedelta64[us]")
    ts.sort()
    types = rng.choice(len(EVENT_TYPES), n,
                       p=[0.45, 0.3, 0.05, 0.05, 0.15])
    props = [json.dumps({"k": int(v % 7)}) for v in types]
    return pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, max(n // 20, 1), n),
                            pa.int64()),
        "event_type": pa.array(
            [EVENT_TYPES[i] for i in types], pa.string()),
        "value": pa.array(
            np.round(rng.exponential(120.0, n), 2), pa.float64()),
        "props": pa.array(props, pa.string()),
    })


def main() -> int:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(int(sf * 1000) + 42)
    for name, fn, per_sf in (
        ("documents", gen_documents, 50_000),
        ("embeddings", gen_embeddings, 20_000),
        ("events", gen_events, 1_000_000),
    ):
        n = int(per_sf * sf)
        tbl = fn(n, rng)
        pq.write_table(tbl, os.path.join(out, f"{name}.parquet"),
                       row_group_size=65536)
        print(f"{name}: {n} rows -> {out}/{name}.parquet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
