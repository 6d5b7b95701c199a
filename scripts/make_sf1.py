"""Deterministic sf1.0 (10x sf0.1) generator for the scaling diagnostic.

VERDICT r11 "Next round" #1: the engine has never been measured above
sf0.1; the 100-TB design claims (banded candidates, broadcast bounds,
quadkey equi-joins) are plan-verified but not scale-measured. The driver's
testdata stops at sf0.1 and /root/testdata is read-only, so this script
derives a 10x dataset locally (default .sf1_data/, gitignored).

Construction — replica 0 is sf0.1 verbatim; replicas 1..9 are FRESH draws
from sf0.1's empirical distributions, with all keys offset by
`replica * keyspan` so every join's per-key fanout is identical to sf0.1:

- region/nation: fixed dims, copied once (same as the reference's TPC-H-ish
  shape, where dims don't scale with sf).
- customer/supplier/part/orders/lineitem/events: replicated with key
  remapping (o_custkey, l_orderkey/partkey/suppkey, user_id follow their
  parent table's offset). Value columns are kept verbatim — selectivities
  of every date/price filter are preserved exactly.
- documents: replicas 1..9 are NEW texts sampled from sf0.1's unigram
  distribution with empirical token-count lengths and the empirical joint
  (lang, source) distribution, plus the same ~0.16% forced exact-dup rate.
  Fresh draws (not copies) so dedup/LSH workloads scale in n instead of
  degenerating into 10-way duplicate clusters the original data never has.
- embeddings: replicas 1..9 sample a label from the empirical label
  distribution and draw vec = per-label-mean + per-label-std * N(0,1) —
  preserving cluster structure so ANN/IVF/PQ recall workloads stay
  representative.

Everything is seeded; rerunning produces byte-identical parquet inputs.

Usage: python scripts/make_sf1.py [--out DIR] [--replicas N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
SEED = 42


def _load(name: str) -> pd.DataFrame:
    return pd.read_parquet(SRC / f"{name}.parquet")


def _write(df: pd.DataFrame, out: Path, name: str, schema: pa.Schema) -> None:
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, out / f"{name}.parquet")
    print(f"  {name}: {len(df):,} rows", file=sys.stderr)


def _replicate_keys(df: pd.DataFrame, replicas: int,
                    offsets: dict[str, int]) -> pd.DataFrame:
    """Concat `replicas` copies; each key column shifts by r * span."""
    parts = []
    for r in range(replicas):
        c = df.copy()
        for col, span in offsets.items():
            c[col] = c[col] + r * span
        parts.append(c)
    return pd.concat(parts, ignore_index=True)


def _span(s: pd.Series) -> int:
    return int(s.max()) + 1


def gen_documents(docs: pd.DataFrame, replicas: int) -> pd.DataFrame:
    tokens_per_doc = docs["text"].str.split(" ")
    lengths = tokens_per_doc.str.len().to_numpy()
    unigrams = pd.Series(
        [t for toks in tokens_per_doc for t in toks]
    ).value_counts()
    vocab = unigrams.index.to_numpy()
    probs = (unigrams / unigrams.sum()).to_numpy()
    pairs = docs[["lang", "source"]].to_numpy()
    n = len(docs)
    dup_pairs = int(round((n - docs["text"].nunique()) / 1.0))  # ~8 at sf0.1
    span = _span(docs["doc_id"])

    out = [docs]
    for r in range(1, replicas):
        rng = np.random.default_rng((SEED, r))
        lens = rng.choice(lengths, size=n)
        # one flat draw, then split by length — vectorized
        flat = rng.choice(vocab, size=int(lens.sum()), p=probs)
        bounds = np.cumsum(lens)[:-1]
        texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]
        # forced exact dups at the empirical rate
        for _ in range(dup_pairs):
            i, j = rng.integers(0, n, size=2)
            texts[j] = texts[i]
        pick = rng.integers(0, n, size=n)
        out.append(pd.DataFrame({
            "doc_id": docs["doc_id"].to_numpy() + r * span,
            "text": texts,
            "lang": pairs[pick, 0],
            "source": pairs[pick, 1],
            "n_chars": [len(t) for t in texts],
        }))
    return pd.concat(out, ignore_index=True)


def gen_embeddings(emb: pd.DataFrame, replicas: int) -> pd.DataFrame:
    mat = np.stack(emb["embedding"].to_numpy())
    labels = emb["label"].to_numpy()
    label_vals, label_counts = np.unique(labels, return_counts=True)
    label_p = label_counts / label_counts.sum()
    means = {v: mat[labels == v].mean(axis=0) for v in label_vals}
    stds = {v: mat[labels == v].std(axis=0) for v in label_vals}
    n, dim = mat.shape
    span = _span(emb["vec_id"])

    out = [emb]
    for r in range(1, replicas):
        rng = np.random.default_rng((SEED, 1000 + r))
        new_labels = rng.choice(label_vals, size=n, p=label_p)
        vecs = np.empty((n, dim), dtype=np.float32)
        for v in label_vals:
            m = new_labels == v
            vecs[m] = (means[v] +
                       stds[v] * rng.standard_normal((int(m.sum()), dim))
                       ).astype(np.float32)
        out.append(pd.DataFrame({
            "vec_id": emb["vec_id"].to_numpy() + r * span,
            "embedding": list(vecs),
            "label": new_labels.astype(labels.dtype),
        }))
    return pd.concat(out, ignore_index=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).resolve().parent.parent
                                         / ".sf1_data"))
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    R = args.replicas

    schemas = {t.stem: pq.read_schema(t) for t in SRC.glob("*.parquet")}

    # fixed dims — copied once
    for name in ("region", "nation"):
        _write(_load(name), out, name, schemas[name])

    customer = _load("customer")
    supplier = _load("supplier")
    part = _load("part")
    orders = _load("orders")
    events = _load("events")
    li = _load("lineitem")
    c_span, s_span, p_span = (_span(customer["c_custkey"]),
                              _span(supplier["s_suppkey"]),
                              _span(part["p_partkey"]))
    o_span, e_span, u_span = (_span(orders["o_orderkey"]),
                              _span(events["event_id"]),
                              _span(events["user_id"]))

    # c_name/s_name are key-derived in the source data
    # ('Customer#%09d' / 'Supplier#%09d') — regenerate them from the
    # offset keys so replicas keep the functional dependency. Without
    # this, 10 suppliers share each name and any query whose oracle
    # groups by name diverges from a group-by-key plan (the q21 r12
    # finding); p_name is ALREADY non-unique in the source (64 distinct
    # over 20k parts), so its verbatim copy is faithful.
    cust_rep = _replicate_keys(customer, R, {"c_custkey": c_span})
    cust_rep["c_name"] = "Customer#" + cust_rep["c_custkey"].astype(
        "int64").astype(str).str.zfill(9)
    _write(cust_rep, out, "customer", schemas["customer"])
    supp_rep = _replicate_keys(supplier, R, {"s_suppkey": s_span})
    supp_rep["s_name"] = "Supplier#" + supp_rep["s_suppkey"].astype(
        "int64").astype(str).str.zfill(9)
    _write(supp_rep, out, "supplier", schemas["supplier"])
    _write(_replicate_keys(part, R, {"p_partkey": p_span}),
           out, "part", schemas["part"])
    _write(_replicate_keys(orders, R, {"o_orderkey": o_span,
                                       "o_custkey": c_span}),
           out, "orders", schemas["orders"])
    _write(_replicate_keys(li, R, {"l_orderkey": o_span,
                                   "l_partkey": p_span,
                                   "l_suppkey": s_span}),
           out, "lineitem", schemas["lineitem"])
    _write(_replicate_keys(events, R, {"event_id": e_span,
                                       "user_id": u_span}),
           out, "events", schemas["events"])

    _write(gen_documents(_load("documents"), R),
           out, "documents", schemas["documents"])
    _write(gen_embeddings(_load("embeddings"), R),
           out, "embeddings", schemas["embeddings"])
    print(f"wrote sf{0.1 * R:g} dataset to {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
