"""Sequence chunking: split documents into fixed-length token windows.

Training-data prep flattens a corpus of variable-length documents into
model-sized sequences. The operator here is the deterministic first
half of that (chunking — one doc in, ceil(n/seq_len) rows out); the
cross-doc packing half is an order-dependent concatenation downstream
systems do at batch-assembly time.

Scale shape: a pure per-row flat-map inside ``map_batches`` — no
shuffle, no state, no driver participation; output rows carry only the
window text, so block sizes stay bounded by seq_len regardless of how
long input documents are (a 1 GB document becomes many small rows, not
one giant one).

Tokens are whitespace runs over the trimmed text — the same scheme the
``doc_token_counts`` oracle pins — so DuckDB can verify every window
boundary and payload exactly.
"""

from __future__ import annotations

import pyarrow as pa


def chunk_batch(batch: pa.Table, seq_len: int = 64,
                id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Explode each doc into (doc_id, chunk_id, n_chunk_tokens,
    chunk_text) windows of seq_len whitespace tokens."""
    ids, cids, lens, texts = [], [], [], []
    for did, t in zip(batch[id_col].to_pylist(),
                      batch[text_col].to_pylist()):
        toks = (t or "").split()
        for ci in range(0, (len(toks) + seq_len - 1) // seq_len):
            w = toks[ci * seq_len:(ci + 1) * seq_len]
            ids.append(did)
            cids.append(ci)
            lens.append(len(w))
            texts.append(" ".join(w))
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "chunk_id": pa.array(cids, pa.int64()),
        "n_chunk_tokens": pa.array(lens, pa.int64()),
        "chunk_text": pa.array(texts, pa.string()),
    })


def chunk_documents(ds, seq_len: int = 64, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Dataset wiring: one stateless map_batches, fully streaming."""
    return ds.map_batches(
        lambda b: chunk_batch(b, seq_len, id_col, text_col),
        batch_format="pyarrow")


def pack_sequences(ds, ctx_len: int = 256, n_parts: int = 32,
                   id_col: str = "doc_id", text_col: str = "text"):
    """Cross-doc sequence packing (the half chunking defers): concatenate
    every document's tokens in id order and split the stream into
    ctx_len-token training sequences; each doc gets the (seq_id,
    seq_offset) where its first token lands — i.e. a global exclusive
    prefix sum of token counts, bucketed by ctx_len.

    Distributed scan, no global sort: ids are bucketed into n_parts
    CONTIGUOUS ranges (part = id // span — order-functional, unlike a
    hash), phase 1 aggregates one token-count sum per range (n_parts
    rows to the driver for the exclusive scan — constant, not O(docs)),
    phase 2 cumsums inside each range and adds its broadcast offset.
    The slim (id, n_tokens, part) table is materialized between phases
    so the text column is read once: 20 bytes/doc in the object store,
    spillable, never on the driver.

    Returns a Dataset (doc_id, n_tokens, seq_id, seq_offset).
    """
    import numpy as np
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    max_id = ds.max(on=id_col)
    span = max(1, (int(max_id) + n_parts) // n_parts)

    def slim(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_tok = pa.array(
            [len((t or "").split()) for t in batch[text_col].to_pylist()],
            pa.int64())
        part = pa.array((ids // span).astype("int64"), pa.int64())
        return pa.table({id_col: batch[id_col], "n_tokens": n_tok,
                         "part": part})

    slim_ds = ds.map_batches(slim, batch_format="pyarrow").materialize()

    sums = slim_ds.groupby("part") \
        .aggregate(Sum("n_tokens", alias_name="part_tokens")).to_pandas() \
        .sort_values("part")
    offsets = dict(zip(
        sums["part"],
        np.concatenate([[0], np.cumsum(sums["part_tokens"].to_numpy())[:-1]])
    ))
    off_ref = ray.put(offsets)

    def scan_part(df: pd.DataFrame) -> pd.DataFrame:
        base = int(ray.get(off_ref)[int(df["part"].iloc[0])])
        df = df.sort_values(id_col, kind="mergesort")
        cum_prev = base + np.concatenate(
            [[0], np.cumsum(df["n_tokens"].to_numpy())[:-1]])
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "n_tokens": df["n_tokens"].to_numpy(),
            "seq_id": (cum_prev // ctx_len).astype("int64"),
            "seq_offset": (cum_prev % ctx_len).astype("int64"),
        })

    return slim_ds.groupby("part").map_groups(
        scan_part, batch_format="pandas")
