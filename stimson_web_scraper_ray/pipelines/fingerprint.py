"""Winnowing document fingerprints — the MOSS scheme (Schleimer,
Wilkerson, Aiken: "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD 2003).

Per document: hash every n-token gram of the ``phrase_tokens`` stream,
slide a w-gram window over the hash sequence, and select the RIGHTMOST
MINIMUM of each window (robust winnowing's tie-break). The selected
(position, hash) set is the document's fingerprint: any shared substring
of >= n + w - 1 tokens between two documents is guaranteed to produce at
least one shared fingerprint, while the expected density is only
2/(w+1) of the grams — the local-sampling guarantee that mod-p
fingerprinting lacks.

Reference parity note: the reference engine has no fingerprinting tier
(stimson-web-scraper stops at per-article hashes, article.py link_hash);
this module is part of the LLM-training-data operator set the brief
requires beyond the reference.

Scale shape
-----------
``winnow_fingerprints`` is a PURE PER-DOC MAP (no shuffle): fingerprints
stream out at ~2/(w+1) rows per corpus token. ``winnow_overlap_pairs``
is the two-key-functional-exchange pattern shared with
``ngram_jaccard_pairs``: fingerprints exchange on their hash (pairs are
emitted where the hash lives), pair counts exchange on the (a, b) key —
never an all-pairs product, never a driver-resident corpus map.

The gram hash is the first 60 bits of md5 over the gram string — chosen
because the DuckDB oracle can compute the identical value
(``('0x' || substr(md5(g), 1, 15))::UBIGINT``), making the whole
selection bit-checkable end to end. The scheme is hash-agnostic: at
100 TB you would swap in the vectorized rolling gram hash
(dedup._gram_hashes) and drop oracle parity, changing no other line.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# positions are packed against the hash for the rightmost-min tie-break
# in the SQL oracle (h * 2^20 + (2^20-1 - pos) under HUGEINT); docs must
# stay under 2^20 grams for the packing to be injective
_POS_LIMIT = 1 << 20


def _doc_fingerprints(toks: list[str], n: int, w: int):
    """One doc's winnowing selection: (positions, hashes) arrays.

    Windows are every length-w run of gram positions when the doc has
    >= w grams, else the single window covering all grams (so every
    non-empty gram stream yields >= 1 fingerprint). Selection per
    window = rightmost minimum (argmin over the reversed window)."""
    G = len(toks) - n + 1
    if G <= 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    if G >= _POS_LIMIT:
        raise ValueError(
            f"doc has {G} grams >= 2^20; winnowing's oracle packing "
            "assumes < 2^20 grams per doc — split the doc upstream")
    h = np.fromiter(
        (int(hashlib.md5(" ".join(toks[i:i + n]).encode())
             .hexdigest()[:15], 16) for i in range(G)),
        dtype=np.int64, count=G)
    if G <= w:
        j = int(h[::-1].argmin())
        pos = np.array([G - 1 - j], np.int64)
    else:
        win = np.lib.stride_tricks.sliding_window_view(h, w)[:, ::-1]
        j = win.argmin(axis=1)  # first-in-reversed = rightmost min
        pos = np.unique(np.arange(G - w + 1, dtype=np.int64)
                        + (w - 1 - j))
    return pos, h[pos]


def winnow_fingerprints(ds, n: int = 3, w: int = 8,
                        id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, pos, fp) rows — the winnowing-selected fingerprints of
    every document. Pure per-doc map_batches; no shuffle."""
    from .index import phrase_tokens

    def fp_rows(batch: pa.Table) -> pa.Table:
        ids, poss, fps = [], [], []
        for did, txt in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
            p, f = _doc_fingerprints(phrase_tokens(txt), n, w)
            ids.extend([did] * len(p))
            poss.append(p)
            fps.append(f)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "pos": pa.array(np.concatenate(poss) if poss
                            else np.empty(0, np.int64), pa.int64()),
            "fp": pa.array(np.concatenate(fps) if fps
                           else np.empty(0, np.int64), pa.int64()),
        })

    return ds.map_batches(fp_rows, batch_format="pyarrow")


def winnow_overlap_pairs(ds, n: int = 3, w: int = 8, min_shared: int = 2,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Doc pairs sharing >= ``min_shared`` DISTINCT fingerprint hashes —
    the MOSS similarity report. Two key-functional exchanges (fp hash,
    then pair key); pairs are emitted where the fingerprint lives."""
    import ray.data as rd

    from .dedup import _self_merge_pairs
    from .shuffle import salted_partition_apply

    fps = winnow_fingerprints(ds, n=n, w=w, id_col=id_col,
                              text_col=text_col)

    def distinct_per_doc(t: pa.Table) -> pa.Table:
        # per-doc fingerprint SET: positions dropped, in-doc dup hashes
        # collapsed so the later pair count is a distinct-overlap count
        df = t.select([id_col, "fp"]).to_pandas() \
            .drop_duplicates([id_col, "fp"])
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "fp": pa.array(df["fp"].to_numpy(), pa.int64())})

    def fp_part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # blocks of one part may still carry in-doc dups split across
        # input batches — finish the per-(doc, fp) dedup here, where
        # every copy of a hash is co-located
        df = df.rename(columns={id_col: "doc_id"}) \
            .drop_duplicates(["doc_id", "fp"])
        m = _self_merge_pairs(df[["fp", "doc_id"]], ["fp"], cap=None)
        return pd.DataFrame({
            "a": pd.Series(m["doc_id_x"].to_numpy(), dtype="int64"),
            "b": pd.Series(m["doc_id_y"].to_numpy(), dtype="int64")})

    pairs = salted_partition_apply(
        fps.map_batches(distinct_per_doc, batch_format="pyarrow"),
        fp_part_pairs,
        combine_key=lambda t: t["fp"].to_numpy(zero_copy_only=False))

    def pair_key(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            k = (t["a"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + t["b"].to_numpy().astype(np.uint64))
        return k.view(np.int64)

    def count_filter(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], sort=False).size().reset_index(
            name="n_shared")
        out = g[g["n_shared"] >= min_shared]
        return pd.DataFrame({
            "a": pd.Series(out["a"].to_numpy(), dtype="int64"),
            "b": pd.Series(out["b"].to_numpy(), dtype="int64"),
            "n_shared": pd.Series(out["n_shared"].to_numpy(),
                                  dtype="int64")})

    df = salted_partition_apply(pairs, count_filter, pair_key).to_pandas()
    if df.empty:
        return rd.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"),
             "b": pd.Series(dtype="int64"),
             "n_shared": pd.Series(dtype="int64")}))
    return rd.from_pandas(df.sort_values(["a", "b"]).reset_index(drop=True))
