"""Crawl-snapshot diff — the incremental-recrawl primitive.

A production crawler re-visits the web and needs the delta between two
crawl snapshots: which URLs appeared, disappeared, or changed content.
The reference engine has no incremental story (its URL memo,
utils.py:134-181, only suppresses re-fetches); at 100 TB the delta IS
the product — you re-extract only ``changed``/``added`` keys instead of
the whole corpus.

Scale shape: both snapshots are (key, fingerprint) projections — the
fingerprint is computed where the content lives and only ~48 B/row
enters the exchange. One tagged-union key-functional exchange
co-locates each key's old and new rows; the per-part outer merge is
vectorized pandas. No side is materialized on the driver; output is a
Dataset of (key, status) that downstream stages consume streaming
(e.g. ``status IN ('added','changed')`` → re-extract).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import salted_partition_apply

_SIDE = "__snap_side"


def fingerprint_md5(texts: list) -> list[str]:
    """md5 hex of the utf-8 text — the same content fingerprint the
    exact-dedup stage uses (dedup.add_md5); per-row by nature."""
    return [hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in texts]


def snapshot_diff(old_ds, new_ds, key_col: str, fp_col: str,
                  n_parts: int = 64):
    """Per-key crawl delta between two snapshots of (key, fingerprint):

    - ``added``     key only in ``new_ds``
    - ``removed``   key only in ``old_ds``
    - ``changed``   key in both, fingerprints differ
    - ``unchanged`` key in both, fingerprints equal

    Assumes ``key_col`` is unique within each snapshot (a crawl's
    canonical URL after prepare_url — D1/J1 guarantee this upstream);
    duplicate keys within a side would pairwise-explode in the merge.
    Key may be int or string (folded via the join key hash).
    """
    from .join import _key_to_int64

    def pad(side_flag: int):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                key_col: t[key_col],
                fp_col: t[fp_col],
                _SIDE: pa.array(np.full(len(t), side_flag, np.int8)),
            })
        return fn

    both = old_ds.map_batches(pad(0), batch_format="pyarrow") \
        .union(new_ds.map_batches(pad(1), batch_format="pyarrow"))

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        old = df.loc[df[_SIDE] == 0, [key_col, fp_col]]
        new = df.loc[df[_SIDE] == 1, [key_col, fp_col]]
        m = old.merge(new, on=key_col, how="outer",
                      suffixes=("_old", "_new"))
        fp_old, fp_new = m[fp_col + "_old"], m[fp_col + "_new"]
        status = np.select(
            [fp_old.isna(), fp_new.isna(), (fp_old == fp_new)],
            ["added", "removed", "unchanged"],
            default="changed")
        return pd.DataFrame({key_col: m[key_col],
                             "status": pd.array(status, dtype="string")})

    return salted_partition_apply(
        both, part_fn,
        combine_key=lambda t: _key_to_int64(t, key_col),
        n_parts=n_parts)
