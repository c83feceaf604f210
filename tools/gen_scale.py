"""Scale-up generator for the sf1 soak (VERDICT r03 item 1).

Builds a ~10x copy of `/root/testdata/sf0.1` under `_scale/sf1/` so
`bench.py` can measure per-query scaling exponents beyond the largest
driver-shipped scale factor.  The testdata itself is read-only and its
generator is not published, so each table is scaled the way a larger
TPC-H-ish dataset actually grows:

- **relational tables** (orders/lineitem/customer/supplier/part):
  replicate ROWS x10 with key-space offsets — value distributions stay
  exact, key cardinality grows x10, FK fanout (4 lineitems/order,
  10 orders/customer) stays constant.  region/nation are fixed dims.
- **events**: replicate x10 with INTERLEAVED ids (``id*10 + r``) so the
  table keeps its id~time ordering (the CDC staging quartiles depend
  on it), and a fresh user_id block per replica (x10 users, same
  per-user activity shape).
- **documents**: fresh synthesis from the observed sf0.1 vocabulary
  (31 words, uniform 10-100 words/doc) with near-dup pairs planted at
  the observed rate (~5% of docs are a 5%-mutated copy) and exact dups
  at the observed rate (~8 groups per 5k docs).  Plain x10 replication
  would create 10-deep exact-dup groups and inflate MinHash candidate
  volume ~x100 — measuring an artifact, not scale.
- **embeddings**: fresh unit vectors (observed stddev 1/sqrt(64) =>
  L2-normalized), following the driver's observed count scaling
  (500 @ sf0.01 -> 2000 @ sf0.1 -> 8000 @ sf1), labels uniform 0-9.

Deterministic (fixed seeds).  Usage:
    python tools/gen_scale.py [SRC_DIR] [OUT_DIR] [FACTOR]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

# key column -> its key-space size at sf0.1 (offset stride per replica)
KEYED = {
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000, "l_suppkey": 1_000},
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
}


def _write(df: pd.DataFrame, out_dir: str, name: str) -> None:
    table = pa.Table.from_pandas(df, preserve_index=False)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"wrote {name}: {len(df):,} rows", file=sys.stderr)


def replicate_keyed(src: pd.DataFrame, offsets: dict[str, int], factor: int) -> pd.DataFrame:
    reps = []
    for r in range(factor):
        rep = src.copy()
        for col, stride in offsets.items():
            rep[col] = rep[col] + r * stride
        reps.append(rep)
    return pd.concat(reps, ignore_index=True)


def scale_events(src: pd.DataFrame, factor: int, n_users: int) -> pd.DataFrame:
    reps = []
    for r in range(factor):
        rep = src.copy()
        rep["event_id"] = rep["event_id"] * factor + r
        rep["user_id"] = rep["user_id"] + r * n_users
        reps.append(rep)
    out = pd.concat(reps, ignore_index=True)
    return out.sort_values("event_id", ignore_index=True)


def gen_documents(n: int, seed: int = 1) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 101, size=n)
    docs: list[list[str]] = []
    for i in range(n):
        if i > 0 and i % 20 == 19:  # ~5%: near-dup of the previous doc
            words = list(docs[i - 1])
            n_mut = max(1, len(words) // 20)
            for j in rng.integers(0, len(words), size=n_mut):
                words[j] = vocab[rng.integers(0, len(vocab))]
        elif i > 0 and i % 625 == 313:  # ~8 per 5k: exact dup
            words = list(docs[i - 1])
        else:
            words = list(vocab[rng.integers(0, len(vocab), size=lengths[i])])
        docs.append(words)
    texts = [" ".join(w) for w in docs]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n, p=LANG_P),
            "source": [f"src{i}" for i in rng.integers(0, 20, size=n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 2) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(v),
            "label": rng.integers(0, 10, size=n).astype(np.int32),
        }
    )


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_scale", "sf1"
    )
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)

    for name in ("region", "nation"):
        _write(pd.read_parquet(os.path.join(src_dir, f"{name}.parquet")), out_dir, name)
    for name, offsets in KEYED.items():
        src = pd.read_parquet(os.path.join(src_dir, f"{name}.parquet"))
        _write(replicate_keyed(src, offsets, factor), out_dir, name)
    ev = pd.read_parquet(os.path.join(src_dir, "events.parquet"))
    n_users = int(ev["user_id"].max()) + 1
    _write(scale_events(ev, factor, n_users), out_dir, "events")
    n_docs = len(pd.read_parquet(os.path.join(src_dir, "documents.parquet")))
    _write(gen_documents(n_docs * factor), out_dir, "documents")
    n_emb = len(pd.read_parquet(os.path.join(src_dir, "embeddings.parquet")))
    # observed driver scaling: x4 per decade, not x10
    _write(gen_embeddings(n_emb * 4), out_dir, "embeddings")


if __name__ == "__main__":
    main()
