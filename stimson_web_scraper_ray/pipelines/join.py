"""Distributed hash equi-join built on the salted-partition primitive.

Ray Data (2.49) ships no general join; the engine's broadcast join
(analytics.py) covers dimension tables, but two fact-scaled sides need a
real co-partitioned join. Shape:

    union(left + side tag, right + side tag)       - schema-padded
    -> one all-to-all on hash(key) % n_parts       - the ONLY exchange
    -> per-part vectorized ``pandas.merge``        - n_parts dispatches

Both sides of any key land in the same part (key-functional partition),
so the merge is exact; per-task memory is one part of EACH side, and the
dispatch count is n_parts — never per-key Python (the map_groups-per-key
anti-pattern measured at ~10 s / 160k groups in shuffle.py). Skewed keys
follow the same salting story as the rest of the engine: a hot key's
part grows, not the driver.

Keys may be int64 or string (strings are FNV-folded to int64 for the
partition only; the merge still compares the real values).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .shuffle import salted_partition_apply

_SIDE = "__join_side"


def _normalize_to(out_fields):
    """Final map_batches stage casting join output back to the declared
    schema. pandas upcasts int columns that saw any null (pad rows, or
    unmatched keys under how='left') to float64/NaN, so without this the
    output dtypes depend on the match rate and on which join path
    (broadcast vs exchange) ran.

    Columns already at (or integer-castable to) the target type go
    through arrow ``cast`` — EXACT for 64-bit values. The pandas
    NaN→null hop survives only for float→int columns (legacy
    broadcast-path upcasts; exact only below 2^53 — the exchange paths
    now keep ints nullable-exact upstream so they never land here;
    review finding: the unconditional pandas round-trip re-corrupted
    the very values the Int64 merge had preserved)."""
    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for n, typ in out_fields:
            col = t[n]
            if (pa.types.is_floating(col.type)
                    and pa.types.is_integer(typ)):
                cols[n] = pa.Array.from_pandas(col.to_pandas(),
                                               type=typ)
            else:
                try:
                    cols[n] = pc.cast(col, typ)
                except (pa.ArrowNotImplementedError, pa.ArrowInvalid):
                    # e.g. ragged list cells re-typed as Ray's tensor
                    # extension by the pandas exchange — the pandas
                    # rebuild handles what cast can't
                    cols[n] = pa.Array.from_pandas(col.to_pandas(),
                                                   type=typ)
        return pa.table(cols)
    return fn


def _schema_pad(out_fields, side_flag: int):
    """Align one side of a tagged-union exchange to the full output
    schema. Integer columns absent on this side ZERO-fill rather than
    null-fill: the per-part merge slices rows by ``_SIDE`` before
    reading any column, so pad values are never consumed — but a null
    would make the whole unioned column int-with-nulls, and the
    map_groups arrow→pandas conversion turns that into float64,
    silently corrupting REAL values above 2^53 on BOTH sides (review
    finding; 64-bit hash ids are the norm for the graph and dedup
    callers). Non-integer columns keep nulls (no precision hazard)."""
    def fn(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for name, typ in out_fields:
            names.append(name)
            if name in t.column_names:
                arrays.append(pc.cast(t[name], typ))
            elif pa.types.is_integer(typ):
                arrays.append(pa.array(
                    np.zeros(len(t), dtype=np.int64), typ))
            else:
                arrays.append(pa.nulls(len(t), typ))
        names.append(_SIDE)
        arrays.append(pa.array(np.full(len(t), side_flag, np.int8)))
        return pa.table(dict(zip(names, arrays)))
    return fn


def _key_to_int64(t: pa.Table, key: str) -> np.ndarray:
    col = t[key]
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    # string key: vectorized stable fold (partition only, not equality).
    # pandas' hash_array is SipHash with a FIXED default key, so it is
    # deterministic across worker processes (unlike builtin hash, which
    # PYTHONHASHSEED randomizes); categorize=True hashes each distinct
    # key once, so hot keys cost one hash, not one per row.
    enc = pc.cast(col, pa.string()).to_pandas().fillna("")
    h = pd.util.hash_array(enc.to_numpy(dtype=object), categorize=True)
    return h.view(np.int64)


def hash_join(left, right, on: str, *, right_on: str | None = None,
              how: str = "inner", n_parts: int = 64):
    """Join two Datasets on an equi-key. ``right_on`` renames the right
    key to ``on`` first (output carries ``on`` once). Non-key column
    names must be disjoint. ``how``: inner | left | full | semi | anti —
    semi/anti return left rows with/without a right match (left columns
    only), the shape of EXISTS / NOT EXISTS decorrelation; the right
    side contributes only its distinct keys to each part, so a hot right
    key costs one set entry, not a row explosion. ``full`` keeps
    unmatched rows of BOTH sides (the key column is coalesced; the other
    side's columns come back null) — exchange-only semantics: a
    streaming broadcast path can't know a right row matched *nowhere*,
    so ``adaptive_join`` deliberately doesn't offer it."""
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if right_on and right_on != on:
        right = right.rename_columns({right_on: on})
    if how in ("semi", "anti"):
        # only the right KEYS matter — prune before the exchange
        right = right.select_columns([on])

    # Schema wrapper (.names/.types) is uniform across Arrow and pandas
    # blocks — keeps joins chainable over map_groups outputs
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    out_fields = ([(n, ltypes[n]) for n in lcols]
                  + [(n, rtypes[n]) for n in rcols if n != on])

    both = left.map_batches(_schema_pad(out_fields, 0),
                            batch_format="pyarrow") \
        .union(right.map_batches(_schema_pad(out_fields, 1),
                                 batch_format="pyarrow"))

    rkeep = [n for n in rcols if n != on]
    # columns that a null-introducing join would silently upcast to
    # float64: pandas NaN-pads unmatched rows, and int64 values above
    # 2^53 (64-bit hash ids — the norm for the web-scale graph/dedup
    # callers) lose low bits in that hop with NO error (review
    # finding). Nullable Int64 keeps them exact through the merge;
    # _normalize_to casts back to plain arrow int64-with-nulls.
    r_int = [n for n in rkeep if pa.types.is_integer(rtypes[n])] \
        if how in ("left", "full") else []
    l_int = [n for n in lcols if n != on
             and pa.types.is_integer(ltypes[n])] \
        if how == "full" else []          # key stays plain int64: the
    # outer merge coalesces it from whichever side, never nulls it,
    # and mixed Int64/int64 merge keys are a pandas edge to avoid

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df[_SIDE] == 0][lcols]
        if how in ("semi", "anti"):
            hit = l[on].isin(df.loc[df[_SIDE] == 1, on].unique())
            return l[hit if how == "semi" else ~hit]
        r = df[df[_SIDE] == 1][[on] + rkeep]
        if r_int:
            r = r.astype({c: "Int64" for c in r_int})
        if l_int:
            l = l.astype({c: "Int64" for c in l_int})
        return l.merge(r, on=on, how="outer" if how == "full" else how)

    joined = salted_partition_apply(
        both, merge_part,
        combine_key=lambda t: _key_to_int64(t, on),
        n_parts=n_parts)
    keep = out_fields if how in ("inner", "left", "full") \
        else [(n, ltypes[n]) for n in lcols]
    return joined.map_batches(_normalize_to(keep), batch_format="pyarrow")


def adaptive_join(big, small, on: str, *, right_on: str | None = None,
                  how: str = "inner", broadcast_limit: int = 2_000_000,
                  n_parts: int = 64):
    """Join where ``small`` is EXPECTED (not guaranteed) to be little —
    e.g. a heavily filtered fact table. Counts it first (one execution
    of its lineage, cached by materialize): under ``broadcast_limit``
    rows it ships once via ``ray.put`` and the big side is joined
    row-local inside ``map_batches`` with ZERO exchange of the big side;
    over the limit it falls back to the bucketed ``hash_join``. This is
    the engine's runtime broadcast-vs-exchange switch — the data-
    dependent analogue of the static dimension-table broadcasts.

    ``how``: inner | left | semi | anti (same semantics as hash_join).
    Output column set matches hash_join; row order differs (big side's
    block order is preserved on the broadcast path).
    """
    import ray

    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    small_mat = small.materialize()
    if small_mat.count() > broadcast_limit:
        return hash_join(big, small_mat, on, right_on=right_on, how=how,
                         n_parts=n_parts)

    sdf = small_mat.to_pandas()
    if right_on and right_on != on:
        sdf = sdf.rename(columns={right_on: on})
    overlap = (set(big.schema().names) & set(sdf.columns)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    if how in ("semi", "anti"):
        keys = frozenset(sdf[on])
        kref = ray.put(keys)

        def filt(df: pd.DataFrame) -> pd.DataFrame:
            hit = df[on].isin(ray.get(kref))
            return df[hit if how == "semi" else ~hit]

        return big.map_batches(filt, batch_format="pandas")

    # declared output schema — must match the hash_join fallback so the
    # output dtypes don't flip with the small side's row count
    bschema, sschema = big.schema(), small_mat.schema()
    btypes = dict(zip(bschema.names, bschema.types))
    stypes = dict(zip(sschema.names, sschema.types))
    skey = right_on if (right_on and right_on in stypes) else on
    out_fields = ([(n, btypes[n]) for n in bschema.names]
                  + [(n, stypes[n]) for n in sschema.names if n != skey])
    sref = ray.put(sdf)

    def merge(df: pd.DataFrame) -> pa.Table:
        m = df.merge(ray.get(sref), on=on, how=how)
        return pa.table({n: pa.Array.from_pandas(m[n], type=typ)
                         for n, typ in out_fields})

    return big.map_batches(merge, batch_format="pandas")


def asof_join(left, right, *, on: str, by: str,
              direction: str = "backward",
              allow_exact_matches: bool = True, n_parts: int = 64):
    """Distributed AS-OF join: for every left row, the single right row
    of the same ``by`` key whose ``on`` value is the nearest at-or-before
    (backward) / at-or-after (forward) the left's — SQL's ASOF JOIN, the
    standard event-to-latest-state alignment. Left rows with no
    qualifying right row keep nulls (left-join semantics).

    Shape: the same ONE union-pad exchange as ``hash_join``, keyed on
    ``by`` (key-functional: every row of a key lands in one part), then
    a per-part ``pandas.merge_asof`` over the part sorted by ``on`` —
    the inequality matching never crosses parts, so no global sort and
    no driver materialization. Skewed keys follow the hash_join story.
    Right-side ties on (by, on) must be pre-aggregated away by the
    caller (one row per (by, on)) for a deterministic pick — the same
    precondition SQL ASOF imposes for a well-defined result."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction={direction!r}")
    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    overlap = (set(lcols) & set(rcols)) - {on, by}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    rkeep = [n for n in rcols if n not in (on, by)]
    out_fields = ([(n, ltypes[n]) for n in lcols]
                  + [(n, rtypes[n]) for n in rkeep])

    both = left.map_batches(_schema_pad(out_fields, 0),
                            batch_format="pyarrow") \
        .union(right.map_batches(_schema_pad(out_fields, 1),
                                 batch_format="pyarrow"))

    # asof-unmatched left rows NaN-pad the right columns — Int64 keeps
    # big int64 payloads exact through that hop (same hazard as
    # hash_join's left join; review finding)
    r_int = [n for n in rkeep if pa.types.is_integer(rtypes[n])]

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df[_SIDE] == 0][lcols].sort_values(on, kind="mergesort")
        r = df[df[_SIDE] == 1][[by, on] + rkeep] \
            .sort_values(on, kind="mergesort")
        if l.empty:
            # right-only part: emit the full output shape, zero rows
            return l.reindex(columns=[n for n, _ in out_fields])
        if r_int:
            r = r.astype({c: "Int64" for c in r_int})
        return pd.merge_asof(l, r, on=on, by=by, direction=direction,
                             allow_exact_matches=allow_exact_matches)

    joined = salted_partition_apply(
        both, merge_part,
        combine_key=lambda t: _key_to_int64(t, by),
        n_parts=n_parts)
    return joined.map_batches(_normalize_to(out_fields),
                              batch_format="pyarrow")


def skew_join(left, right, on: str, *, how: str = "inner",
              hot_frac: float = 0.01, hot_bytes_limit: int = 64 << 20,
              n_parts: int = 64, stats: dict | None = None):
    """Skew-aware equi-join: HOT left keys bypass the exchange.

    The hash_join above is key-functional, so one pathological key (the
    celebrity user, the parked domain) lands its entire row mass in one
    part and serializes that task. This variant routes around it:

      1. Heavy-hitter detect — each left batch emits (key, count) only
         for keys at ≥ ``hot_frac`` of the batch (a key at ≥ hot_frac of
         the WHOLE left must reach that fraction in ≥ 1 batch, so the
         candidate set is a superset of the true heavy set; ≤ 1/hot_frac
         candidates per batch reach the driver — batch-scaled, not
         row-scaled). Routing is a pure performance decision: ANY split
         is correct, so the lower-bound counts need no second pass.
      2. Right rows with hot keys materialize and broadcast (ray.put);
         the hot left slice joins them INSIDE map_batches — the skewed
         row mass never shuffles. If the hot right slice exceeds
         ``hot_bytes_limit`` the whole join falls back to hash_join
         (a key hot on BOTH sides is a genuine cross-product; no
         routing fixes that).
      3. Cold rows take the normal bucketed hash_join; hot and cold key
         sets are disjoint, so the two output streams union exactly.

    ``how``: inner | left. ``stats`` receives hot_keys / hot_left_rows
    for the tests' routing assertions. Same output contract as
    hash_join (column set, dtypes; row order differs)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")

    lschema, rschema = left.schema(), right.schema()
    lcols, rcols = list(lschema.names), list(rschema.names)
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    out_fields = ([(n, ltypes[n]) for n in lcols]
                  + [(n, rtypes[n]) for n in rcols if n != on])

    # --- 1. heavy-hitter candidates (batch-local Misra-Gries-style) ---
    def hot_partial(t: pa.Table) -> pa.Table:
        k = _key_to_int64(t, on)
        keys, counts = np.unique(k, return_counts=True)
        m = counts >= max(1, int(hot_frac * len(k)))
        return pa.table({"__k": pa.array(keys[m], pa.int64()),
                         "__c": pa.array(counts[m], pa.int64())})

    cand = left.map_batches(hot_partial, batch_format="pyarrow") \
        .to_pandas()
    agg = cand.groupby("__k")["__c"].sum() if len(cand) else pd.Series(
        dtype="int64")
    n_left = left.count()
    hot = np.sort(agg[agg >= hot_frac * n_left].index.to_numpy()
                  .astype(np.int64))
    if stats is not None:
        stats["hot_keys"] = len(hot)

    if len(hot) == 0:
        if stats is not None:
            stats["hot_left_rows"] = 0
        return hash_join(left, right, on, how=how, n_parts=n_parts)

    href = ray.put(hot)

    def split(want_hot: bool):
        def fn(t: pa.Table) -> pa.Table:
            mask = np.isin(_key_to_int64(t, on), ray.get(href))
            return t.filter(pa.array(mask if want_hot else ~mask))
        return fn

    # --- 2. hot path: broadcast the right slice ---
    right_hot = right.map_batches(split(True), batch_format="pyarrow") \
        .materialize()
    if right_hot.size_bytes() > hot_bytes_limit:
        return hash_join(left, right, on, how=how, n_parts=n_parts)
    rdf = right_hot.to_pandas()
    rref = ray.put(rdf)
    left_hot = left.map_batches(split(True), batch_format="pyarrow")
    if stats is not None:
        # materialize so the instrumentation count and the join share
        # ONE execution of the split scan (review finding: the bare
        # count re-ran the full left pipeline)
        left_hot = left_hot.materialize()
        stats["hot_left_rows"] = left_hot.count()

    def hot_merge(df: pd.DataFrame) -> pa.Table:
        m = df.merge(ray.get(rref), on=on, how=how)
        return pa.table({n: pa.Array.from_pandas(m[n], type=typ)
                         for n, typ in out_fields})

    hot_out = left_hot.map_batches(hot_merge, batch_format="pandas")

    # --- 3. cold path: the normal exchange (disjoint key sets) ---
    cold_out = hash_join(
        left.map_batches(split(False), batch_format="pyarrow"),
        right.map_batches(split(False), batch_format="pyarrow"),
        on, how=how, n_parts=n_parts)
    return hot_out.union(cold_out)


def build_key_bloom(ds, key_col: str, m_bits: int = 1 << 20,
                    k_hashes: int = 7, fanin: int = 8) -> np.ndarray:
    """Distributed Bloom filter over an int64 KEY column (splitmix64 →
    Kirsch–Mitzenmacher double hashing, same bit algebra as the gram
    bloom): per-batch bitmaps fold through the shared
    ``shuffle.tree_or_bitmaps`` remote tree, so the driver touches O(1)
    bitmaps regardless of key count."""
    from .dedup import _bloom_bit_idx
    from .shuffle import tree_or_bitmaps
    from .sketch import splitmix64

    if m_bits % 8:
        # bit indices run to m_bits-1 but the bitmap has m_bits//8
        # bytes — a non-multiple silently out-of-bounds the OR
        # (review finding); fail fast instead
        raise ValueError(f"m_bits must be a multiple of 8 (got {m_bits})")
    nbytes = m_bits // 8

    def to_bitmap(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pc.cast(batch[key_col], pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        bits = np.zeros(nbytes, dtype=np.uint8)
        if keys.size:
            idx = _bloom_bit_idx(splitmix64(keys), m_bits, k_hashes)
            np.bitwise_or.at(bits, idx >> 3,
                             (1 << (idx & 7)).astype(np.uint8))
        return pa.table({"bm": pa.array([bits.tobytes()], pa.binary())})

    return tree_or_bitmaps(
        ds.map_batches(to_bitmap, batch_format="pyarrow"),
        nbytes, fanin=fanin)


def bloom_key_mask(keys: np.ndarray, bits: np.ndarray, m_bits: int,
                   k_hashes: int) -> np.ndarray:
    """Vectorized membership probe: True where ALL k bits are set
    (false positives possible, false negatives impossible)."""
    from .dedup import _bloom_bit_idx
    from .sketch import splitmix64

    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_bit_idx(splitmix64(keys.astype(np.uint64)),
                         m_bits, k_hashes).reshape(len(keys), k_hashes)
    hit = (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1
    return hit.all(axis=1)


def bloom_filter_join(big, small, on: str, *, right_on: str | None = None,
                      how: str = "inner", m_bits: int = 1 << 20,
                      k_hashes: int = 7, n_parts: int = 64):
    """EXACT equi-join with a Bloom semi-join pushdown — the standard
    100-TB join-pruning move: the small side's keys fold into one
    broadcast bitmap, the BIG side pre-filters per batch BEFORE the
    join exchange (only bloom-positive rows — matches plus an ~1e-4
    false-positive trickle — ever ship), and the bucketed hash_join
    then removes the false positives exactly. Result ≡ hash_join
    (inner/semi: dropped rows had no match by the no-false-negative
    property); the win is exchange volume ∝ matching rows, not big-
    side rows."""
    import ray

    if how not in ("inner", "semi"):
        raise ValueError("bloom prefilter preserves inner/semi joins "
                         f"only (got how={how!r})")
    key_small = right_on or on
    # materialize: the small pipeline otherwise executes twice — once
    # for the bitmap, once inside the join exchange (review finding)
    small = small.materialize()
    bits = build_key_bloom(small, key_small, m_bits=m_bits,
                           k_hashes=k_hashes)
    bref = ray.put(bits)

    def prefilter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bm = ray.get(bref)
        keys = pc.cast(t[on], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_key_mask(keys, bm, m_bits,
                                                k_hashes)))

    big_f = big.map_batches(prefilter, batch_format="pyarrow")
    return hash_join(big_f, small, on=on, right_on=right_on, how=how,
                     n_parts=n_parts)


def merge_changelog(base, delta, key: str, seq_col: str = "seq",
                    op_col: str = "op", n_parts: int = 64):
    """MERGE INTO / CDC-apply semantics: resolve a changelog against a
    base table by last-writer-wins per key — the surviving row for each
    key is the one with the highest ``seq_col``; a survivor whose
    ``op_col`` is ``'D'`` deletes the key. The lakehouse upsert
    primitive (Delta MERGE / Hudi upsert / Iceberg row-delta apply)
    over plain Datasets.

    Contract: (key, seq) pairs must be unique across base ∪ delta —
    seq ties have no defined winner (same as any CDC stream without a
    total order). Both inputs must share the schema plus seq/op.

    Scale shape: ONE key-functional exchange over base ∪ delta; each
    key resolves wholly inside its part with a vectorized stable sort +
    drop_duplicates (no per-key dispatch). At 100 TB the delta is
    normally ≪ base, so the exchange is dominated by one pass over the
    base — the same cost as rewriting it, which is what an upsert IS
    without key-partitioned storage; over a layout like
    ``zorder_write``'s bucketed sink the same resolve runs per bucket
    touched by the delta."""
    from .shuffle import salted_partition_apply

    both = base.union(delta)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, seq_col], ascending=[True, False],
                            kind="mergesort")
        top = df.drop_duplicates(key)
        top = top[top[op_col] != "D"]
        return top.drop(columns=[seq_col, op_col])

    return salted_partition_apply(
        both, resolve,
        combine_key=lambda t: _key_to_int64(t, key),
        n_parts=n_parts)
