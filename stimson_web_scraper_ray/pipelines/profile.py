"""Column profiling: per-column row/null/distinct counts in two passes.

The data-quality stage every large ingest runs before training-data
curation. Scale shape:

- counts pass: per-batch (col, n_rows, n_nulls) partials → one tiny
  ``groupby(col)`` over n_blocks × n_cols rows;
- distinct pass: values are canonicalized to injective 64-bit hashes
  (ints/epoch-us timestamps pass through, floats by normalized bit
  pattern, strings via blake2b-derived splitmix fold) and exploded to
  (col, h) rows; ONE salted exchange keyed on the pair puts every
  distinct pair wholly in one part, so per-part unique-pair counts sum
  to the exact global distinct count — the same partition algebra as
  ``event_type_distinct_users``.

Exact distinct is an all-to-all over n_cols × n_rows hashes; at 100 TB
swap the distinct pass for ``sketch.hll_distinct_per_group`` (same
(col, h) rows, constant-size registers instead of the pair exchange) —
the profiler takes ``approx=True`` for exactly that.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import salted_partition_apply
from .sketch import splitmix64


def _hash_column(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Injective (per column type) int64 hash of non-null values."""
    t = col.type
    if pa.types.is_timestamp(t):
        col = pc.cast(col, pa.int64())
        t = pa.int64()
    if pa.types.is_integer(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return splitmix64(v).astype(np.int64)
    if pa.types.is_floating(t):
        v = col.to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(v == 0.0, 0.0, v)            # -0.0 == 0.0 in SQL
        bits = v.view(np.uint64)
        nan = np.isnan(v)
        if nan.any():                             # one canonical NaN
            bits = np.where(nan, np.uint64(0x7FF8000000000000), bits)
        return splitmix64(bits).astype(np.int64)
    # strings / binary: blake2b-8 per value (stable across processes)
    out = np.empty(len(col), dtype=np.int64)
    for i, s in enumerate(col.to_pylist()):
        b = s.encode("utf-8") if isinstance(s, str) else bytes(s)
        out[i] = int.from_bytes(
            hashlib.blake2b(b, digest_size=8).digest(), "little",
            signed=True)
    return out


def profile_table(ds, cols: list[str], approx: bool = False,
                  n_parts: int = 64) -> pd.DataFrame:
    """(col, n_rows, n_nulls, n_distinct) per column — exact by default,
    HLL-approximate with ``approx=True`` (the 100-TB path)."""
    from ray.data.aggregate import Sum

    def count_partial(t: pa.Table) -> pa.Table:
        names, rows, nulls = [], [], []
        for c in cols:
            names.append(c)
            rows.append(t.num_rows)
            nulls.append(t[c].null_count)
        return pa.table({"col": pa.array(names, pa.string()),
                         "n_rows": pa.array(rows, pa.int64()),
                         "n_nulls": pa.array(nulls, pa.int64())})

    counts = ds.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("col") \
        .aggregate(Sum("n_rows", alias_name="n_rows"),
                   Sum("n_nulls", alias_name="n_nulls")).to_pandas()

    def explode(t: pa.Table) -> pa.Table:
        names, hashes = [], []
        for c in cols:
            col = t[c]
            mask = pc.is_valid(col)
            valid = col.filter(mask) if col.null_count else col
            h = _hash_column(valid)
            names.append(np.full(len(h), cols.index(c), np.int64))
            hashes.append(h)
        ci = np.concatenate(names) if names else np.empty(0, np.int64)
        hv = np.concatenate(hashes) if hashes else np.empty(0, np.int64)
        return pa.table({"ci": pa.array(ci, pa.int64()),
                         "h": pa.array(hv, pa.int64())})

    pairs = ds.map_batches(explode, batch_format="pyarrow")

    if approx:
        from .sketch import hll_distinct_per_group

        dist = hll_distinct_per_group(pairs, "ci", "h", p=12)
        dist = dist.rename(columns={"ci": "ci",
                                    "approx_distinct": "n_distinct"})
    else:
        def part_distinct(df: pd.DataFrame) -> pd.DataFrame:
            u = df.drop_duplicates()
            return u.groupby("ci", sort=False).size() \
                .reset_index(name="n_distinct")

        partials = salted_partition_apply(
            pairs, part_distinct,
            combine_key=lambda t: (
                t["ci"].to_numpy() * np.int64(0x9E3779B9)
                + t["h"].to_numpy()),
            n_parts=n_parts).to_pandas()
        dist = partials.groupby("ci", sort=False)["n_distinct"].sum() \
            .reset_index()

    dist["col"] = dist["ci"].map(dict(enumerate(cols)))
    out = counts.merge(dist[["col", "n_distinct"]], on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    for c in ("n_rows", "n_nulls"):
        out[c] = out[c].astype("int64")
    return out.sort_values("col").reset_index(drop=True)
