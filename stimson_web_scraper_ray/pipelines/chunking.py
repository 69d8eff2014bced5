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
