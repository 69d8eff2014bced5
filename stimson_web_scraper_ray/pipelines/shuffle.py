"""salted_partition_apply — the engine's distributed-groupby primitive.

Ray Data's native ``groupby(key).aggregate()`` / ``map_groups`` pays
per-distinct-group overhead in its reduce (measured here: ~10 s on 160k
LSH buckets, 247 s on 1.1M pair keys, 7 s on 147k order keys at sf0.1).
This primitive does the SAME exchange volume as one groupby — one
all-to-all — then hands each coarse partition to vectorized pandas:

    part = key % n_parts              (key-functional: no group splits)
    groupby(part).map_groups(part_fn) (n_parts dispatches, not per key)

``part_fn(DataFrame) -> DataFrame`` sees all rows of every key assigned
to its part and runs grouped transforms / aggregations / self-merges
in-process. Keys and rows never touch the driver; per-task memory is
the part size — at cluster scale set ``n_parts ≈ total_rows / 2M`` so a
part fits a worker's heap (64 covers the test scales and 32-way
parallelism).

Used by: the dedup family (LSH bucket pairing, pair aggregation), crawl
distributed planning (frontier dedup, per-host budgeting), and the
high-cardinality relational aggregates (per-order revenue, distinct
users).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa


def salted_partition_apply(rows_ds, part_fn: Callable[[pd.DataFrame],
                                                      pd.DataFrame],
                           combine_key: Callable[[pa.Table], np.ndarray],
                           n_parts: int = 64):
    """``combine_key(table) -> np.ndarray[int64]`` folds the key columns
    into one int64 per row (numpy ``%`` is sign-of-divisor, so negative
    keys still land in [0, n_parts)). Returns the Dataset of part_fn
    outputs."""

    def add_part(t: pa.Table) -> pa.Table:
        part = (combine_key(t) % np.int64(n_parts)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def run_part(df: pd.DataFrame) -> pd.DataFrame:
        return part_fn(df.drop(columns=["part"])).reset_index(drop=True)

    return rows_ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(run_part, batch_format="pandas")


def grouped_topk(ds, group_cols: list[str], order_col: str, k: int,
                 combine_key, descending: bool = True,
                 tie_cols: list[str] | None = None, n_parts: int = 64,
                 rank_col: str | None = None):
    """Top-k rows per group (SQL ``row_number() OVER (PARTITION BY ...
    ORDER BY ...) <= k``) without a global sort: every group lives
    wholly in one salted part (combine_key must be group-functional), so
    one exchange + a vectorized per-part ``groupby.head(k)`` is exact.
    ``tie_cols`` break order ties deterministically (asc); with ties
    total per group, ``rank_col`` (1-based) matches row_number exactly.

    This is the scale shape for per-entity leaderboards: the alternative
    ``groupby(group).map_groups`` pays per-distinct-group dispatch (~10 s
    per 160k groups, see module docstring) and a global ``sort`` +
    window pays a full-rank exchange for rows that are then discarded."""
    ties = tie_cols or []

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([order_col] + ties,
                            ascending=[not descending] + [True] * len(ties),
                            kind="mergesort")
        g = df.groupby(group_cols, sort=False)
        if rank_col is not None:
            df = df.assign(**{rank_col: (g.cumcount() + 1).astype("int64")})
            return df[df[rank_col] <= k]
        return g.head(k)

    return salted_partition_apply(ds, part_fn, combine_key, n_parts)


def hrw_assign(ds, key_col: str, n_shards: int,
               alt_shards: int | None = None, n_parts: int = 16):
    """Rendezvous (highest-random-weight, Thaler–Ravishankar 1998)
    assignment of each DISTINCT key to one of ``n_shards``: shard =
    argmax over s of md5(key + '#' + s). The minimal-churn alternative
    to the seen-set's ``hash % n_shards`` routing — growing the pool to
    ``alt_shards`` moves only the keys whose new shard's hash wins
    (expectation 1 − n/alt of nothing: ~1/alt of keys), where modulo
    routing reshuffles nearly everything. The crawl-tier primitive for
    host→worker pinning that survives cluster resizes.

    Hash is bit-compatible with DuckDB's ``md5_number_lower`` (the
    little-endian read of the LAST 8 digest bytes — verified against
    DuckDB; the first-8 read is a different number), so every
    assignment is SQL-checkable.

    Scale shape: per-batch distinct + one key-functional exchange
    collapse the key universe (dimension-scaled), then a pure map
    computes n_shards hashes per key. Returns a Dataset
    (key, shard[, shard_alt, moved])."""
    import hashlib

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.select([key_col]).group_by([key_col]).aggregate([])

    def key_fold(t: pa.Table) -> np.ndarray:
        # reuse the join module's canonical string-key fold (one
        # null/cast policy, not two — review finding); imported here
        # to keep shuffle -> join from becoming an import cycle
        from .join import _key_to_int64
        return _key_to_int64(t, key_col)

    distinct = salted_partition_apply(
        ds.map_batches(batch_distinct, batch_format="pyarrow"),
        lambda df: df.drop_duplicates(key_col),
        key_fold, n_parts=n_parts)

    hi = max(n_shards, alt_shards or 0)

    def assign(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        hv = np.empty((len(keys), hi), dtype=np.uint64)
        for r, k in enumerate(keys):
            for s in range(hi):
                d = hashlib.md5(f"{k}#{s}".encode()).digest()
                # md5_number_lower = little-endian of the LAST 8 bytes
                hv[r, s] = int.from_bytes(d[8:], "little")
        shard = np.argmax(hv[:, :n_shards], axis=1).astype(np.int64)
        out = {key_col: t[key_col], "shard": pa.array(shard, pa.int64())}
        if alt_shards is not None:
            alt = np.argmax(hv[:, :alt_shards], axis=1).astype(np.int64)
            out["shard_alt"] = pa.array(alt, pa.int64())
            out["moved"] = pa.array(alt != shard, pa.bool_())
        return pa.table(out)

    return distinct.map_batches(assign, batch_format="pyarrow")


def tree_or_bitmaps(bitmap_ds, nbytes: int, fanin: int = 8) -> np.ndarray:
    """Fold a Dataset of single-row ``{'bm': binary}`` bitmap blocks
    into ONE OR-combined byte array with remote tree fan-in — the
    driver touches O(1) bitmaps regardless of block count. Shared by
    the gram bloom (dedup.bloom_decontaminate) and the key bloom
    (join.bloom_filter_join); previously copy-pasted in both (review
    finding)."""
    import ray

    refs = list(bitmap_ds.to_arrow_refs())
    if not refs:
        return np.zeros(nbytes, dtype=np.uint8)
    while len(refs) > 1:
        refs = [_or_bitmap_tables.remote(*refs[i:i + fanin])
                for i in range(0, len(refs), fanin)]
    final = ray.get(refs[0])
    return np.frombuffer(final["bm"].to_pylist()[0], np.uint8).copy()


def _make_or_remote():
    import ray

    @ray.remote
    def or_bitmap_tables(*tbls: pa.Table) -> pa.Table:
        acc = None
        for t in tbls:
            for buf in t["bm"].to_pylist():
                b = np.frombuffer(buf, np.uint8)
                if acc is None:
                    acc = b.copy()
                else:
                    np.bitwise_or(acc, b, out=acc)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    return or_bitmap_tables


_or_bitmap_tables = _make_or_remote()


def collect_sorted_keys(ds, col: str, dtype=np.int64) -> np.ndarray:
    """Collect one integer column of a (small, duplicate-volume- or
    candidate-scaled) Dataset into ONE sorted numpy array on the driver
    — the broadcast side of the sorted-set membership probe. int64 →
    uint64 conversion is modular (same bits as a view), so uint64
    callers sort in unsigned order as required. Shared by the phrase-
    search candidate filter and the ExactSubstr dup-hash sets
    (previously copy-pasted at three sites — review finding)."""
    import ray

    blocks = [ray.get(r) for r in ds.to_arrow_refs()]
    arrs = []
    for b in blocks:
        # to_arrow_refs can surface pandas blocks unconverted when the
        # lineage ends in a map_groups (Ray 2.49) — accept both
        if isinstance(b, pd.DataFrame):
            if col in b.columns:
                arrs.append(np.asarray(b[col].to_numpy()))
        elif col in b.schema.names:
            arrs.append(b[col].to_numpy(zero_copy_only=False))
    cat = np.concatenate(arrs or [np.empty(0, dtype)])
    if cat.dtype == object:
        # blocks can surface int64 columns as OBJECT arrays of Python
        # ints; object->uint64 warns on negatives today and fails
        # under future numpy — hop through int64 (exact), then the
        # typed astype below is modular (same bits as a view)
        cat = cat.astype(np.int64)
    return np.sort(cat.astype(dtype))


def sorted_membership(sorted_keys: np.ndarray,
                      probe: np.ndarray) -> np.ndarray:
    """Vectorized membership mask of ``probe`` in ``sorted_keys`` —
    the searchsorted + clip + equality idiom in one place (the clip
    bound is the easy-to-fumble part)."""
    if sorted_keys.size == 0:
        return np.zeros(probe.size, dtype=bool)
    idx = np.searchsorted(sorted_keys, probe)
    np.clip(idx, 0, sorted_keys.size - 1, out=idx)
    return sorted_keys[idx] == probe
