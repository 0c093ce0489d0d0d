#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 corpus for the bench ratio
curve (BASELINE.md): replicate the star-schema fact/dim tables K times with
consistent key offsets, and regenerate the text/vector corpora from the
measured distributions of the originals.

Why not replicate documents/embeddings too? Replicated text makes every doc
an exact K-plex of itself: the n-gram/LSH self-joins would grow K^2 in the
duplicate groups and the dedup operators' semantics (dup rate, group sizes)
would no longer resemble the original corpus. Instead, new docs are drawn
from the original corpus's unigram distribution + empirical length/lang
mixes, with the same planted dup-pair rate (8 pairs per 5000 docs at
sf0.1); embeddings are fresh unit-normalized gaussians matching the
originals' per-component scale. Fact tables (orders/lineitem/...) replicate
exactly like TPC-H scaling: each copy is an independent key-shard, so join
fan-out and per-key group sizes are preserved while totals scale linearly.

Usage: python tools/make_scaled_sf.py K [out_dir]
Writes <out_dir or /tmp/scaled/sf{0.1*K}>/{table}.parquet (multi-row-group).
Seed fixed; output is a pure function of (source dir, K).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
#: dense 0-based key-space sizes in the sf0.1 source (verified by scan)
STRIDES = {
    "customer": ("c_custkey", 15_000),
    "supplier": ("s_suppkey", 1_000),
    "part": ("p_partkey", 20_000),
    "orders": ("o_orderkey", 150_000),
}
DOCS_PER_UNIT = 5_000
DUP_PAIRS_PER_UNIT = 8  # measured: 8 exact-dup pairs in 5000 sf0.1 docs
VECS_PER_UNIT = 2_000
EVENTS_USER_STRIDE = 1_500


def _read(table: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{table}.parquet"))


def _offset(col: pa.ChunkedArray, k: int, stride: int) -> pa.Array:
    import pyarrow.compute as pc

    return pc.add(col, pa.scalar(k * stride, type=col.type))


def _replicate(tbl: pa.Table, k_copies: int, offsets: dict[str, int]) -> pa.Table:
    """K copies of ``tbl``; each named key column shifted by copy*stride."""
    parts = []
    for k in range(k_copies):
        cols = []
        for name in tbl.column_names:
            col = tbl.column(name)
            if name in offsets and k > 0:
                col = pa.chunked_array([_offset(col, k, offsets[name])])
            cols.append(col)
        parts.append(pa.table(cols, names=tbl.column_names))
    return pa.concat_tables(parts)


def _regen_names(tbl: pa.Table, key: str, name_col: str, prefix: str) -> pa.Table:
    """Entity names embed their key (Customer#000000042) — keep that true
    for offset keys so name-grouped queries keep per-entity cardinality."""
    keys = tbl.column(key).to_numpy()
    names = pa.array([f"{prefix}#{int(v):09d}" for v in keys])
    return tbl.set_column(tbl.column_names.index(name_col), name_col, names)


def _gen_documents(k_copies: int, rng: np.random.Generator) -> pa.Table:
    src = _read("documents")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()

    words = np.array(" ".join(texts).split())
    vocab, counts = np.unique(words, return_counts=True)
    probs = counts / counts.sum()
    lengths = np.array([len(t.split()) for t in texts])
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_probs = lang_counts / lang_counts.sum()

    n = DOCS_PER_UNIT * k_copies
    doc_lengths = rng.choice(lengths, size=n, replace=True)
    total_words = int(doc_lengths.sum())
    flat = rng.choice(vocab, size=total_words, replace=True, p=probs)
    out_texts: list[str] = []
    pos = 0
    for ln in doc_lengths:
        out_texts.append(" ".join(flat[pos : pos + int(ln)]))
        pos += int(ln)
    # plant exact-dup pairs at the measured rate
    n_pairs = DUP_PAIRS_PER_UNIT * k_copies
    srcs = rng.choice(n, size=n_pairs * 2, replace=False)
    for a, b in zip(srcs[:n_pairs], srcs[n_pairs:]):
        out_texts[int(b)] = out_texts[int(a)]
    out_langs = rng.choice(lang_vals, size=n, replace=True, p=lang_probs)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": pa.array(out_texts),
            "lang": pa.array(out_langs.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n)]),
            "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
        }
    )


def _gen_embeddings(k_copies: int, rng: np.random.Generator) -> pa.Table:
    src = _read("embeddings")
    dim = len(src.column("embedding")[0])
    n = VECS_PER_UNIT * k_copies
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)  # originals are unit-norm
    labels = rng.integers(0, 10, size=n).astype(np.int32)
    emb_type = pa.list_(pa.float32())
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=emb_type),
            "label": pa.array(labels, type=pa.int32()),
        }
    )


def make_scaled(k_copies: int, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    def write(name: str, tbl: pa.Table, groups: int = 32) -> None:
        dst = os.path.join(out_dir, f"{name}.parquet")
        tmp = dst + ".tmp"
        pq.write_table(tmp_tbl := tbl, tmp, row_group_size=max(tmp_tbl.num_rows // groups, 4096))
        os.replace(tmp, dst)
        print(f"  {name}: {tbl.num_rows} rows")

    for name in ("region", "nation"):
        write(name, _read(name))

    cust = _replicate(_read("customer"), k_copies, {"c_custkey": STRIDES["customer"][1]})
    write("customer", _regen_names(cust, "c_custkey", "c_name", "Customer"))
    supp = _replicate(_read("supplier"), k_copies, {"s_suppkey": STRIDES["supplier"][1]})
    write("supplier", _regen_names(supp, "s_suppkey", "s_name", "Supplier"))
    write("part", _replicate(_read("part"), k_copies, {"p_partkey": STRIDES["part"][1]}))
    write(
        "orders",
        _replicate(
            _read("orders"),
            k_copies,
            {"o_orderkey": STRIDES["orders"][1], "o_custkey": STRIDES["customer"][1]},
        ),
    )
    write(
        "lineitem",
        _replicate(
            _read("lineitem"),
            k_copies,
            {
                "l_orderkey": STRIDES["orders"][1],
                "l_partkey": STRIDES["part"][1],
                "l_suppkey": STRIDES["supplier"][1],
            },
        ),
    )
    ev = _read("events")
    write(
        "events",
        _replicate(
            ev,
            k_copies,
            {"event_id": ev.num_rows, "user_id": EVENTS_USER_STRIDE},
        ),
    )
    write("documents", _gen_documents(k_copies, rng))
    write("embeddings", _gen_embeddings(k_copies, rng))
    return out_dir


def main() -> None:
    k = int(sys.argv[1])
    sf = round(0.1 * k, 1)
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/scaled/sf{sf:g}"
    print(f"scaling sf0.1 x{k} -> {out}")
    make_scaled(k, out)


if __name__ == "__main__":
    main()
