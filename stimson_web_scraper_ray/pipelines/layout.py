"""Z-order (Morton) clustered data layout + pruned 2-D box queries.

The storage-layout tier of the engine: cluster a fact table on the
bit-interleaved (Morton) code of two query dimensions, write it as
key-range-bucketed parquet, and serve box queries by reading ONLY the
buckets whose Morton key range can intersect the box — the same
data-skipping idea as Delta/Iceberg Z-ORDER clustering, expressed as a
Ray Data pipeline (one streamed annotate + one partitioned
``write_parquet``; no shuffle beyond the sink's bucketing).

Correctness never depends on the pruning: quantization only decides
WHICH buckets might hold a row, and the query re-filters exactly on the
raw column values. Pruning quality is asserted separately (tests pin
buckets_read < buckets_total for a small box; the query returns its own
read stats so callers can audit skipping at scale).

Scale shape: the annotate is a pure vectorized map (bit-twiddled
interleave, no Python loop); bucket boundaries are fixed equal key
ranges so the sink needs no global sort — at 100 TB each bucket is a
directory a failed run can re-fill independently (the resumable-sink
contract, same as index.write_inverted_index)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

_META = "zorder_meta.json"


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Spread each of the low 16 bits of ``v`` to even positions."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton2(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Interleave two quantized coordinates (≤16 bits each) into the
    Morton code qx→even bits, qy→odd bits."""
    return _spread_bits16(qx) | (_spread_bits16(qy) << np.uint64(1))


def _quantize(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    cells = (1 << bits) - 1
    span = max(hi - lo, 1e-300)
    q = np.floor((np.clip(v, lo, hi) - lo) / span * cells)
    return q.astype(np.uint64)


def zorder_write(ds, out_dir: str, x_col: str, y_col: str,
                 x_lo: float, x_hi: float, y_lo: float, y_hi: float,
                 bits: int = 8, n_buckets: int = 16) -> str:
    """Cluster ``ds`` on morton(quantize(x), quantize(y)) and write
    bucket-partitioned parquet (``bucket=NN/``), bucket = equal Morton
    key range (top log2(n_buckets) bits of the code) — no global sort.
    Quantization bounds are explicit arguments (data-independent, so
    the layout is stable under appends) and stamped into a meta file
    the query side reads back.

    ``n_buckets`` must be a power of two no wider than the Morton code:
    the bucket is the top log2(n_buckets) bits, so e.g. 20 would
    silently floor to 16 real buckets while the query's
    buckets_read/buckets_total stats reported against 20 — returned
    rows stayed correct (write and read floored consistently) but the
    auditable pruning stats lied (advisor finding). Fail fast
    instead."""
    b_exp = n_buckets.bit_length() - 1
    if n_buckets <= 0 or (1 << b_exp) != n_buckets:
        raise ValueError(
            f"n_buckets must be a power of two (got {n_buckets}: the "
            f"bucket id is the top log2(n_buckets) Morton bits)")
    if b_exp > 2 * bits:
        raise ValueError(
            f"n_buckets={n_buckets} needs {b_exp} bucket bits but the "
            f"Morton code only has 2*bits={2 * bits}")

    def annotate(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        z = morton2(_quantize(x, x_lo, x_hi, bits),
                    _quantize(y, y_lo, y_hi, bits))
        bucket = (z >> np.uint64(2 * bits - int(np.log2(n_buckets)))) \
            .astype(np.int64)
        return t.append_column("bucket", pa.array(bucket, pa.int64()))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _META), "w") as f:
        json.dump({"x_col": x_col, "y_col": y_col, "x_lo": x_lo,
                   "x_hi": x_hi, "y_lo": y_lo, "y_hi": y_hi,
                   "bits": bits, "n_buckets": n_buckets}, f)
    ds.map_batches(annotate, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    return out_dir


def zorder_box_query(out_dir: str, x_range: tuple, y_range: tuple,
                     columns: list[str] | None = None):
    """Box query over a ``zorder_write`` layout: enumerate the Morton
    codes of the quantized cells inside the box (≤ 2^(2·bits), tiny at
    the default bits=8), keep only the BUCKETS those codes land in,
    read just those directories and re-filter exactly on the raw
    values. Returns (DataFrame, stats) — stats carries
    buckets_read/buckets_total so pruning is auditable, not assumed."""
    with open(os.path.join(out_dir, _META)) as f:
        meta = json.load(f)
    bits, n_buckets = meta["bits"], meta["n_buckets"]
    qx = _quantize(np.asarray(x_range, np.float64),
                   meta["x_lo"], meta["x_hi"], bits)
    qy = _quantize(np.asarray(y_range, np.float64),
                   meta["y_lo"], meta["y_hi"], bits)
    # enumerate at BUCKET-PREFIX granularity, not per fine cell: the
    # bucket is the top B Morton bits, which depend only on the top
    # hx = B//2 bits of qx and hy = B-hx bits of qy — so one
    # representative fine cell per coarse (qx_hi, qy_hi) cell covers
    # the box in O(n_buckets) work where per-cell enumeration is
    # O(4^bits) (≈2^32 temporaries at bits=16 — review finding)
    B = int(np.log2(n_buckets))
    hx, hy = B // 2, B - B // 2
    sx, sy = np.uint64(bits - hx), np.uint64(bits - hy)
    gx_hi = np.arange(qx[0] >> sx, (qx[1] >> sx) + 1, dtype=np.uint64)
    gy_hi = np.arange(qy[0] >> sy, (qy[1] >> sy) + 1, dtype=np.uint64)
    z = morton2(np.repeat(gx_hi << sx, gy_hi.size),
                np.tile(gy_hi << sy, gx_hi.size))
    shift = np.uint64(2 * bits - B)
    want = np.unique((z >> shift).astype(np.int64))

    # explicit file list: read_parquet resolves a LIST of directory
    # paths inconsistently across Ray versions (single-dir lists error
    # with 'is a directory'); files are unambiguous everywhere
    files = [f for b in want
             for f in sorted(glob.glob(os.path.join(
                 out_dir, f"bucket={b}", "*.parquet")))]
    stats = {"buckets_read": int(want.size),
             "buckets_total": int(n_buckets),
             "cells_probed": int(z.size)}
    if not files:
        # typed-empty contract even when no CANDIDATE bucket has files
        # (clustered data + box over an empty region — review finding):
        # borrow the schema from any bucket of the layout
        any_file = sorted(glob.glob(os.path.join(
            out_dir, "bucket=*", "*.parquet")))
        if not any_file:
            return pd.DataFrame(), stats
        import pyarrow.parquet as pq
        return (pq.read_table(any_file[0], columns=columns)
                .slice(0, 0).to_pandas(), stats)
    # the surviving buckets read DISTRIBUTED (one Dataset over just the
    # candidate directories) and re-filter exactly in the map — the
    # driver only ever sees the final matching rows, so a 100-TB layout
    # costs O(buckets intersecting the box), not O(table)
    import ray.data as rd

    x, y = meta["x_col"], meta["y_col"]
    # one read task per candidate file: letting Ray over-split a small
    # file list creates zero-row splits whose schema-less RefBundles
    # trip the executor's schema-mismatch warning downstream
    ds = rd.read_parquet(files, columns=columns,
                         override_num_blocks=len(files))

    def exact(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if "bucket" in t.column_names and (columns is None
                                           or "bucket" not in columns):
            # hive-inferred partition col — layout metadata, not data;
            # dropping it keeps the schema identical to the
            # typed-empty path (plain pq.read_table never sees it)
            t = t.drop_columns(["bucket"])
        keep = pc.and_(
            pc.and_(pc.greater_equal(t[x], pa.scalar(x_range[0])),
                    pc.less_equal(t[x], pa.scalar(x_range[1]))),
            pc.and_(pc.greater_equal(t[y], pa.scalar(y_range[0])),
                    pc.less_equal(t[y], pa.scalar(y_range[1]))))
        return t.filter(keep)

    df = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
    if df.shape[1] == 0:
        # an all-filtered Dataset drops its schema through to_pandas;
        # rebuild the typed empty frame from the first candidate file
        import pyarrow.parquet as pq
        df = pq.read_table(files[0], columns=columns) \
            .slice(0, 0).to_pandas()
    return df.reset_index(drop=True), stats
