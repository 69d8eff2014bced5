"""Generic relational operator pipelines over the driver's TPC-H-ish
tables — the engine-level aggregation / join / sort / distinct / window
building blocks (SURVEY.md §2.4-2.7) exercised with DuckDB-checkable
semantics.

Conventions for oracle parity: every computed column is explicitly named
(identical names in oracle_sql), money aggregates are rounded to 2
decimals, counts are int64. Operators with SMALL results (aggregates /
top-k) return pandas; operators whose output is fact-scaled (per-order
windows, per-customer stats, as-of matches, sessions) return the
DATASET — production consumers stream it (write_parquet / iter_batches)
and only the oracle-comparison wrappers in ``__ray_entry__`` materialize.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def read(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read with SIZE-AWARE block sizing: Ray's
    default parallelism heuristic targets CPU count, which slices a
    small file into KB-scale micro-blocks — and every downstream
    exchange then pays per-block shuffle overhead (measured: a 165k-row
    salted exchange drops 1.2 s → 0.2 s going from 64 micro-blocks to
    8 right-sized ones). Inputs under 256 MB get ~1 MB-of-file blocks
    (clamped [4, 64]); larger inputs keep Ray's default so cluster-scale
    reads still fan out per row-group."""
    import os

    import ray.data as rd

    path = f"{sf_dir}/{table}.parquet"
    kw = {}
    try:
        size = os.path.getsize(path)
        if size < 256 * (1 << 20):
            kw["override_num_blocks"] = min(64, max(4, size // (1 << 20) + 1))
    except OSError:
        pass
    return rd.read_parquet(path, columns=columns, **kw)


def pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped groupby aggregate over lineitem (A-class ops):
    vectorized derived column + multi-agg groupby + sort."""
    from ray.data.aggregate import Count, Mean, Sum

    ds = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice", "l_discount", "l_shipdate"])
    import datetime

    cutoff = pa.scalar(datetime.datetime(1998, 9, 1), type=pa.timestamp("us"))

    def derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    out = ds.map_batches(derive, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                   Sum("disc_price", alias_name="sum_disc_price"),
                   Mean("l_discount", alias_name="avg_disc"),
                   Count(alias_name="count_order"))
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)
    for c in ("sum_qty", "sum_disc_price", "avg_disc"):
        df[c] = df[c].round(2)
    df["count_order"] = df["count_order"].astype("int64")
    return df


def top_revenue_orders(sf_dir: str, k: int = 10):
    """Top-k join pattern, fact-table safe: revenue per order from
    lineitem (pre-aggregated inside map_batches), distributed
    ``sort(revenue desc, orderkey asc).limit(k)`` IN RAY, then only the k
    winning keys join against a filtered scan of orders. Nothing
    O(|orders|) ever reaches the driver (the round-1 version pulled the
    whole per-order table to the driver and broadcast all of orders).
    The per-order sum runs as a salted-partition aggregate — Ray's
    native groupby.aggregate pays per-distinct-group overhead in the
    reduce (~7 s on 147k orderkeys at sf0.1 vs ~1.5 s salted)."""
    import numpy as np

    from .shuffle import salted_partition_apply

    line = read(sf_dir, "lineitem",
                ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial_rev(t: pa.Table) -> pa.Table:
        # arrow-native (C++) per-batch combine — no pandas round-trip
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        agg = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev}) \
            .group_by("l_orderkey").aggregate([("rev", "sum")])
        return agg.rename_columns(["l_orderkey", "rev"])

    def order_key(t: pa.Table) -> "np.ndarray":
        return t["l_orderkey"].to_numpy()

    def part_topk(df):
        # per-part final sum + LOCAL top-k: each orderkey lives wholly in
        # one part, so the global top-k is contained in the union of the
        # 64 per-part top-k's — the driver merges 64*k rows, no global
        # sort exchange at all
        out = df.groupby("l_orderkey", sort=False)["rev"].sum() \
            .reset_index().rename(columns={"rev": "revenue"})
        return out.sort_values(["revenue", "l_orderkey"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    top = salted_partition_apply(
        line.map_batches(partial_rev, batch_format="pyarrow"),
        part_topk, order_key).to_pandas() \
        .sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                     kind="mergesort").head(k)
    keys = pa.array(top["l_orderkey"].tolist(), pa.int64())

    # join orders for the k winners only: distributed filtered scan, k rows back
    odf = read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            pc.is_in(t["o_orderkey"], value_set=keys)),
            batch_format="pyarrow").to_pandas()

    df = top.merge(odf, left_on="l_orderkey", right_on="o_orderkey",
                   how="inner").sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True],
        kind="mergesort").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(2)
    return df[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


def customer_nation_rollup(sf_dir: str):
    """Two-level broadcast join (customer→nation→region) + groupby — the
    J2 broadcast-small-side pattern: dimension tables shipped once via
    ray.put, fact streamed through map_batches."""
    import ray
    from ray.data.aggregate import Count, Sum

    nation = read(sf_dir, "nation").to_pandas()
    region = read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "n_name",
                                                "r_name"]]
    dref = ray.put(dim.set_index("n_nationkey"))

    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dref)
        return batch.join(d, on="c_nationkey", how="inner")

    out = cust.map_batches(attach, batch_format="pandas") \
        .groupby(["r_name", "n_name"]) \
        .aggregate(Count(alias_name="n_customers"),
                   Sum("c_acctbal", alias_name="total_acctbal"))
    df = out.to_pandas().sort_values(["r_name", "n_name"]).reset_index(drop=True)
    df["total_acctbal"] = df["total_acctbal"].round(2)
    df["n_customers"] = df["n_customers"].astype("int64")
    return df


def events_tumbling_window(sf_dir: str, window_minutes: int = 60):
    """Streaming-shaped tumbling-window aggregate over the events log:
    event-time bucketing inside map_batches (vectorized), then
    groupby(window, event_type) — the engine's window model (ray_guide
    'Streaming-shaped workloads'; ordering assumption: event_time column,
    no late data at rest)."""
    from ray.data.aggregate import Count, Sum

    ds = read(sf_dir, "events", ["ts", "event_type", "value"])
    w_us = window_minutes * 60 * 1_000_000

    def bucket(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64())
        win = pc.multiply(pc.divide(ts, w_us), w_us).cast(pa.timestamp("us"))
        return t.append_column("window_start", win)

    out = ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Count(alias_name="n_events"),
                   Sum("value", alias_name="sum_value"))
    df = out.to_pandas().sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df


def events_hopping_window(sf_dir: str, window_minutes: int = 60,
                          hop_minutes: int = 15):
    """Hopping (sliding) window aggregate: windows of ``window_minutes``
    starting every ``hop_minutes``, so each event lands in
    window/hop overlapping windows (4 at the 60/15 default). The
    overlap factor is applied INSIDE map_batches — each batch emits its
    own expanded rows (numpy tile + per-copy window offsets), so the
    expansion streams with the scan and the only wide step is the same
    window-keyed groupby the tumbling form pays. Window starts are
    hop-aligned (floor(ts/hop) − k copies), matching the SQL oracle's
    generate-series re-derivation row for row."""
    from ray.data.aggregate import Count, Sum

    if window_minutes % hop_minutes:
        raise ValueError("window must be a multiple of hop")
    n_copies = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    ds = read(sf_dir, "events", ["ts", "event_type", "value"])

    def expand(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = ts // hop_us                      # hop-aligned bucket
        n = len(ts)
        # copy k shifts the window start back k hops; every copy is a
        # window that CONTAINS the event (start ≤ ts < start + window)
        k = np.repeat(np.arange(n_copies, dtype=np.int64), n)
        starts = (np.tile(base, n_copies) - k) * hop_us
        idx = np.tile(np.arange(n, dtype=np.int64), n_copies)
        return pa.table({
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "event_type": t["event_type"].take(pa.array(idx)),
            "value": t["value"].take(pa.array(idx)),
        })

    out = ds.map_batches(expand, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Count(alias_name="n_events"),
                   Sum("value", alias_name="sum_value"))
    df = out.to_pandas().sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(2)
    df["n_events"] = df["n_events"].astype("int64")
    return df


def watermark_late_events(sf_dir: str, window_minutes: int = 60,
                          delay_hours: int = 6, n_parts: int = 32):
    """Watermark / allowed-lateness accounting (the Flink/Beam
    semantics) replayed at rest: events arrive in a deterministic
    bounded-disorder order — event-time plus a per-event arithmetic
    jitter of up to 24 h ((event_id·2654435761) mod 86400 seconds;
    identical in the SQL oracle, so the "stream" is re-derivable — and
    the watermark at each arrival is the running max TRUE event-time
    over all prior arrivals minus ``delay_hours``. A tumbling window is
    closed once the watermark passes its end; an event arriving for a
    closed window is late (excluded from the on-time aggregate, counted
    separately).

    The running max over the global arrival order is a two-phase scan
    (pack_sequences' shape with max as the monoid), no global sort:
    arrival keys are VALUE-range bucketed into n_parts contiguous
    ranges (order-functional), phase 1 ships one (part, max_ts) row per
    range to the driver for the exclusive prefix-max, phase 2 cummaxes
    inside each range over (arrival, event_id) order and folds in the
    broadcast base. Per-part output is already the (window, on_time,
    late) partial, so the final exchange is window-scaled.

    Returns pandas (window_start, n_on_time, n_late) — hour-scaled."""
    import ray
    from ray.data.aggregate import Max, Sum

    w_us = window_minutes * 60 * 1_000_000
    delay_us = delay_hours * 3_600_000_000
    NEG = np.int64(np.iinfo(np.int64).min)

    ds = read(sf_dir, "events", ["event_id", "ts"])

    def slim(t: pa.Table) -> pa.Table:
        ts_us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        jit = ((eid.astype(np.uint64) * np.uint64(2654435761))
               % np.uint64(86400)).astype(np.int64) * 1_000_000
        return pa.table({"event_id": t["event_id"],
                         "ts_us": pa.array(ts_us, pa.int64()),
                         "arrival": pa.array(ts_us + jit, pa.int64())})

    slim_ds = ds.map_batches(slim, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Max as _Max, Min as _Min
    bounds = slim_ds.aggregate(_Min("arrival"), _Max("arrival"))
    amin, amax = int(bounds["min(arrival)"]), int(bounds["max(arrival)"])
    span = max(1, (amax - amin) // n_parts + 1)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["arrival"].to_numpy(zero_copy_only=False) - amin) \
            // span
        return t.append_column("part", pa.array(part, pa.int64()))

    parted = slim_ds.map_batches(add_part, batch_format="pyarrow") \
        .materialize()
    # phase 1: one (part, max_ts) row per range -> exclusive prefix max
    maxes = parted.groupby("part") \
        .aggregate(Max("ts_us", alias_name="mx")).to_pandas() \
        .sort_values("part")
    run = np.maximum.accumulate(maxes["mx"].to_numpy(np.int64))
    bases = dict(zip(maxes["part"],
                     np.concatenate([[NEG], run[:-1]])))
    base_ref = ray.put(bases)

    def scan_part(df: pd.DataFrame) -> pd.DataFrame:
        base = np.int64(ray.get(base_ref)[int(df["part"].iloc[0])])
        df = df.sort_values(["arrival", "event_id"], kind="mergesort")
        ts = df["ts_us"].to_numpy(np.int64)
        # the broadcast base joins the running chain (prev[i] =
        # max(base, ts[:i])), not just row 0 — earlier parts can
        # dominate the whole range
        prev = np.maximum.accumulate(
            np.concatenate([[base], ts]))[:-1]
        win_start = ts // w_us * w_us
        # guard the global-first sentinel: NEG - delay would wrap
        late = (prev != NEG) & (win_start + w_us <= prev - delay_us)
        out = pd.DataFrame({"window_start": win_start,
                            "late": late.astype("int64")})
        g = out.groupby("window_start", sort=False)["late"]
        agg = g.agg(n_late="sum", n="count").reset_index()
        agg["n_on_time"] = agg["n"] - agg["n_late"]
        return agg[["window_start", "n_on_time", "n_late"]]

    partials = parted.groupby("part").map_groups(
        scan_part, batch_format="pandas")
    df = partials.groupby("window_start") \
        .aggregate(Sum("n_on_time", alias_name="n_on_time"),
                   Sum("n_late", alias_name="n_late")).to_pandas()
    df["window_start"] = pd.to_datetime(df["window_start"], unit="us")
    df["n_on_time"] = df["n_on_time"].astype("int64")
    df["n_late"] = df["n_late"].astype("int64")
    return df.sort_values("window_start").reset_index(drop=True)


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: sorted event-time gap splitting. ONE
    salted exchange on user_id, then a fully vectorized per-part pass —
    session boundaries are a single cumsum over (new-user | gap-exceeded)
    flags across ALL of the part's users at once, no per-user dispatch
    (the round-1 groupby(user).map_groups form paid per-distinct-group
    overhead in the reduce)."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "ts", "event_type"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"] != df["user_id"].shift()
        gap_break = df["ts"].diff() > gap
        sess_id = (new_user | gap_break).cumsum()
        agg = df.groupby(sess_id).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            n_events=("ts", "size"))
        return agg.reset_index(drop=True)

    # returns the DATASET: sessions are fact-scaled, so production
    # consumers stream them (write_parquet / iter_batches); only the
    # oracle-comparison wrapper materializes
    return salted_partition_apply(
        ds, part_fn, combine_key=lambda t: t["user_id"].to_numpy())


def funnel_counts(ds, steps: list[str], user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  n_parts: int = 32):
    """Ordered funnel analysis (first-touch semantics): a user reaches
    step i iff an event of type ``steps[i]`` occurs STRICTLY AFTER the
    timestamp at which they reached step i-1 (step 0 = their earliest
    steps[0] event). Returns pandas (step, n_users) — one row per step
    in order, n_users monotonically non-increasing: the classic
    conversion-funnel rollup.

    Scale shape: the event stream filters to the funnel's types at the
    read side, ONE user-keyed salted exchange co-locates each user's
    events, and the per-part pass is VECTORIZED PER STEP (a groupby-min
    merge per funnel stage, not a per-user Python walk) — per-part
    output is k rows of partial counts, the driver sums k × n_parts
    ints."""
    import pyarrow.compute as pc

    from .shuffle import salted_partition_apply

    k = len(steps)
    if k == 0 or len(set(steps)) != k:
        raise ValueError("steps must be non-empty and distinct")

    def keep_steps(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[type_col], value_set=pa.array(steps))
        return t.filter(mask).select([user_col, ts_col, type_col])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        counts = []
        # reached: per-user timestamp at which the PREVIOUS step was
        # hit; stage i keeps rows of type steps[i] later than it
        reached = None
        for i, st in enumerate(steps):
            rows = df[df[type_col] == st]
            if reached is not None:
                rows = rows.merge(reached, on=user_col, how="inner")
                rows = rows[rows[ts_col] > rows["__t"]]
                rows = rows.drop(columns=["__t"])
            hit = rows.groupby(user_col, sort=False)[ts_col].min() \
                      .reset_index().rename(columns={ts_col: "__t"})
            counts.append(len(hit))
            reached = hit
        return pd.DataFrame({"step_idx": np.arange(k, dtype=np.int64),
                             "n_users": np.asarray(counts, np.int64)})

    partials = salted_partition_apply(
        ds.map_batches(keep_steps, batch_format="pyarrow"),
        part_fn,
        combine_key=lambda t: t[user_col].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts).to_pandas()
    tot = partials.groupby("step_idx", sort=True)["n_users"].sum()
    return pd.DataFrame({
        "step": [f"step{i + 1}_{s}" for i, s in enumerate(steps)],
        "n_users": [int(tot.get(i, 0)) for i in range(k)]})


def user_event_deltas(sf_dir: str):
    """Per-user lag window (SQL ``lag(ts) OVER (PARTITION BY user_id
    ORDER BY ts, event_id)``): microsecond gap since the user's previous
    event, NULL/NaN for the first. One salted exchange on user_id, then
    a vectorized per-part sort + grouped shift — no global sort and no
    per-user dispatch; at cluster scale a user's history lives in one
    part so the window never crosses tasks."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["ts"].shift(1)
        gap = (df["ts"] - prev) / np.timedelta64(1, "us")
        return df.assign(gap_us=gap.astype("float64"))

    # Dataset return — O(events) rows; stream in production, the oracle
    # wrapper materializes
    return salted_partition_apply(
        ds, part_fn, lambda t: t["user_id"].to_numpy(), n_parts=64)


def event_type_distinct_users(sf_dir: str):
    """Distinct aggregation: unique users per event type (D-class).
    Per-batch drop_duplicates partial, then ONE salted-partition exchange
    keyed on user_id — each part distinct-counts its users per event_type
    with vectorized pandas and emits tiny partial counts (n_parts ×
    n_event_types rows), summed on the driver. Zero per-group Python
    dispatch and zero per-distinct-key reduce overhead (the naive
    groupby(event_type, user_id) form pays it on every distinct pair)."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def user_key(t: pa.Table) -> np.ndarray:
        return t["user_id"].to_numpy()

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        # a user lands wholly in one part, so per-part nunique sums to the
        # global distinct count
        out = df.drop_duplicates().groupby("event_type", sort=False)[
            "user_id"].nunique().reset_index(name="n_users")
        return out

    partials = salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        part_counts, user_key).to_pandas()
    df = partials.groupby("event_type", sort=False)["n_users"].sum() \
        .reset_index().sort_values("event_type").reset_index(drop=True)
    df["n_users"] = df["n_users"].astype("int64")
    return df


def cohort_retention(sf_dir: str):
    """Cohort retention matrix (the SQL two-level self-referential
    aggregate ``events ⋈ (min ts per user)``): cohort_day = day of each
    user's FIRST event, day_offset = days since it, n_users = distinct
    cohort users active at that offset — the canonical recrawl-cadence /
    audience-retention rollup.

    Scale shape: ONE salted exchange on user_id puts every user's full
    history in a single part (the user_event_deltas invariant), so the
    first-touch min, the per-(user, day) distinct and the offset math
    are all part-local vectorized pandas; each part emits only its
    (cohort_day, day_offset, partial count) rows — cohorts × offsets ×
    n_parts scalars, summed in one tiny driver groupby. Nothing
    event-scaled leaves the exchange and no second join pass re-ships
    the first-touch table."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "ts"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].dt.floor("D")
        d = pd.DataFrame({"user_id": df["user_id"], "day": day}) \
            .drop_duplicates()
        first = d.groupby("user_id", sort=False)["day"].transform("min")
        offs = ((d["day"] - first) / np.timedelta64(1, "D")).astype("int64")
        out = pd.DataFrame({"cohort_day": first, "day_offset": offs})
        return out.groupby(["cohort_day", "day_offset"], sort=False) \
            .size().reset_index(name="n_users")

    partials = salted_partition_apply(
        ds, part_fn, lambda t: t["user_id"].to_numpy()).to_pandas()
    out = partials.groupby(["cohort_day", "day_offset"], sort=False)[
        "n_users"].sum().reset_index()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_day", "day_offset"]) \
        .reset_index(drop=True)


def parse_event_props(sf_dir: str):
    """JSON scalar function over the props column (§2.8 JSON ops):
    extract props.k per row, aggregate sum per event_type."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "props"])

    def extract_k(t: pa.Table) -> pa.Table:
        ks = np.fromiter(
            (json.loads(p).get("k", 0) if p else 0
             for p in t["props"].to_pylist()),
            dtype=np.int64, count=t.num_rows)
        return pa.table({"event_type": t["event_type"],
                         "k": pa.array(ks, pa.int64())})

    out = ds.map_batches(extract_k, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Sum("k", alias_name="sum_k"))
    df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
    df["sum_k"] = df["sum_k"].astype("int64")
    return df


def _asof_error_click_impl(sf_dir: str, direction: str):
    """Shared body for the as-of join pair — an operator Ray Data lacks
    natively, composed as ONE salted-partition exchange on the join key +
    a per-part vectorized ``pd.merge_asof`` (no per-user Python dispatch;
    the round-1 form paid groupby(user).map_groups per-distinct-group
    overhead). Partitioning assumption: both sides co-partition on
    user_id, so every user's history is local to one part and the time
    search never crosses tasks.

    backward: for each 'error', the most recent 'click' of the same user
    at or before the error ts; among clicks sharing that ts the LARGEST
    event_id wins (clicks pre-sorted by (ts, event_id); merge_asof
    backward takes the last duplicate).
    forward: the earliest click at or after; ties → SMALLEST event_id
    (merge_asof forward takes the first duplicate). Both oracles select
    the same row explicitly instead of the underspecified SQL ASOF JOIN
    row choice (advisor finding)."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        errors = df[df["event_type"] == "error"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        clicks = df[df["event_type"] == "click"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        empty = pd.DataFrame({
            "event_id": pd.Series(dtype="int64"),
            "user_id": pd.Series(dtype="int64"),
            "err_ts": pd.Series(dtype="datetime64[us]"),
            "click_event_id": pd.Series(dtype="int64"),
            "click_ts": pd.Series(dtype="datetime64[us]"),
        })
        if errors.empty or clicks.empty:
            return empty
        m = pd.merge_asof(
            errors.rename(columns={"ts": "err_ts"})[
                ["event_id", "user_id", "err_ts"]],
            clicks.rename(columns={"event_id": "click_event_id",
                                   "ts": "click_ts"})[
                ["click_event_id", "user_id", "click_ts"]],
            left_on="err_ts", right_on="click_ts", by="user_id",
            direction=direction, allow_exact_matches=True)
        m = m.dropna(subset=["click_event_id"])
        if m.empty:
            return empty
        m["click_event_id"] = m["click_event_id"].astype("int64")
        return m[["event_id", "user_id", "err_ts",
                  "click_event_id", "click_ts"]]

    # Dataset return — O(errors) rows; dtypes are already exact inside
    # part_fn, the oracle wrapper materializes
    return salted_partition_apply(
        ds, part_fn, combine_key=lambda t: t["user_id"].to_numpy())


def asof_error_click(sf_dir: str):
    """Backward as-of join (see _asof_error_click_impl)."""
    return _asof_error_click_impl(sf_dir, "backward")


def asof_next_click(sf_dir: str):
    """Forward as-of join: earliest click at-or-after each error."""
    return _asof_error_click_impl(sf_dir, "forward")


VALUE_BANDS = [(0.0, 5.0, "low"), (5.0, 15.0, "mid"), (15.0, 1e9, "high")]


def range_join_value_bands(sf_dir: str):
    """Range (interval) join — the second join shape Ray Data lacks
    natively: each event joins the band whose [lo, hi) interval contains
    its value. Composed broadcast-side: the interval table ships once and
    each batch assigns bands with a vectorized searchsorted over the
    sorted band edges (intervals here are non-overlapping and
    contiguous-ish; overlapping intervals would emit one row per match
    from the same map_batches). Oracle: DuckDB BETWEEN join."""
    from ray.data.aggregate import Count

    ds = read(sf_dir, "events", ["event_type", "value"])
    edges = np.array([b[0] for b in VALUE_BANDS] + [VALUE_BANDS[-1][1]])
    names = np.array([b[2] for b in VALUE_BANDS])

    def assign(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, v, side="right") - 1
        ok = (idx >= 0) & (idx < len(names))
        return pa.table({
            "event_type": t["event_type"].filter(pa.array(ok)),
            "band": pa.array(names[idx[ok]]),
        })

    out = ds.map_batches(assign, batch_format="pyarrow") \
        .groupby(["event_type", "band"]).aggregate(Count(alias_name="n_events"))
    df = out.to_pandas().sort_values(["event_type", "band"]) \
        .reset_index(drop=True)
    df["n_events"] = df["n_events"].astype("int64")
    return df


def rolling_user_counts(sf_dir: str, window_minutes: int = 60):
    """Sliding event-time window: per (user, ts), how many of the user's
    events fall in [ts - window, ts] — SQL's RANGE INTERVAL frame.

    Scale shape: pre-aggregate events to (user, ts, n) inside
    map_batches (RANGE frames treat same-ts rows as one peer group, so
    this is semantics-preserving, not just a combiner), then ONE
    salted-partition exchange on user_id; inside each part a per-user
    cumsum + searchsorted two-pointer computes every window in O(rows).
    No per-user Python dispatch, nothing driver-side."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "ts"])
    win = np.timedelta64(window_minutes * 60, "s")

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.table({"user_id": t["user_id"], "ts": t["ts"]}) \
            .group_by(["user_id", "ts"]).aggregate([([], "count_all")])
        return agg.rename_columns(["user_id", "ts", "n"])

    def part_windows(df: pd.DataFrame) -> pd.DataFrame:
        # batches may split a (user, ts) pair: re-sum, then window
        df = df.groupby(["user_id", "ts"], sort=True)["n"].sum() \
            .reset_index()
        ts = df["ts"].to_numpy(dtype="datetime64[us]")
        n = df["n"].to_numpy(dtype=np.int64)
        users = df["user_id"].to_numpy()
        cum = n.cumsum()
        starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        bounds = np.r_[starts, len(users)]
        out = np.empty(len(users), dtype=np.int64)
        for i in range(len(starts)):
            a, b = bounds[i], bounds[i + 1]
            lo = a + np.searchsorted(ts[a:b], ts[a:b] - win, side="left")
            base = np.where(lo > a, cum[np.maximum(lo - 1, a)], 0)
            base[lo == a] = cum[a] - n[a]
            out[a:b] = cum[a:b] - base
        return pd.DataFrame({"user_id": users, "ts": df["ts"],
                             "n_window": out})

    return salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        part_windows,
        combine_key=lambda t: t["user_id"].to_numpy().astype(np.int64))


def customer_order_stats(sf_dir: str):
    """LEFT OUTER join + aggregate with null-fill: every customer with
    their order count and total spend, zeros for customers who never
    ordered (COUNT(o)/COALESCE(SUM),0 over a LEFT JOIN).

    Scale shape: orders are FIRST reduced to one row per custkey (arrow
    per-batch combine + one salted exchange), so the outer join's right
    side is |customers| rows, not |orders|; then hash_join(how='left')
    co-partitions both sides in a second exchange. Null-fill is a
    vectorized fillna on the joined stream."""
    from .join import hash_join
    from .shuffle import salted_partition_apply

    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        agg = pa.table({"o_custkey": t["o_custkey"],
                        "o_totalprice": t["o_totalprice"]}) \
            .group_by("o_custkey") \
            .aggregate([("o_totalprice", "count"), ("o_totalprice", "sum")])
        return agg.rename_columns(["o_custkey", "n_orders", "total_spent"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=False) \
            .agg(n_orders=("n_orders", "sum"),
                 total_spent=("total_spent", "sum")).reset_index()

    per_cust = salted_partition_apply(
        orders.map_batches(partial, batch_format="pyarrow"), final,
        combine_key=lambda t: t["o_custkey"].to_numpy())

    # per_cust rode pandas blocks out of the salted exchange; hash_join
    # introspects an ARROW schema, so normalize the block format first
    per_cust = per_cust.map_batches(
        lambda t: pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "n_orders": pc.cast(t["n_orders"], pa.int64()),
            "total_spent": pc.cast(t["total_spent"], pa.float64())}),
        batch_format="pyarrow")

    cust = read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"])
    j = hash_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                  how="left")

    def null_fill(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].fillna(0).astype("int64")
        df["total_spent"] = df["total_spent"].fillna(0.0).round(2)
        return df

    # null-fill is row-local → stays on the stream; Dataset return
    # (O(customers) rows — production consumers write, not collect)
    return j.map_batches(null_fill, batch_format="pandas")


def customer_running_revenue(sf_dir: str):
    """Cumulative window: SQL ``sum(o_totalprice) OVER (PARTITION BY
    o_custkey ORDER BY o_orderdate, o_orderkey)``. One salted exchange on
    custkey, then a per-part mergesort + grouped cumsum — the running sum
    never crosses tasks because a customer's orders land in one part."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "orders",
              ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            kind="mergesort")
        run = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return df.assign(running_total=run.round(2))

    # Dataset return — O(orders) rows; the oracle wrapper materializes
    return salted_partition_apply(
        ds, part_fn, combine_key=lambda t: t["o_custkey"].to_numpy())


def shipping_priority(sf_dir: str, cutoff: str = "1998-07-01",
                      segment: str = "BUILDING", k: int = 10,
                      broadcast_limit: int = 2_000_000):
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem with date filters,
    revenue per order, global top-k. Three fact-scaled inputs, TWO
    exchanges total:

      1. semi hash_join(orders_filtered, building_customers) — the
         customer side ships keys only (pruned inside hash_join);
      2. a FUSED join+aggregate+top-k: union(lineitem revenue partials,
         surviving order rows) partitioned by orderkey — inside each part
         the revenue sum, the orders merge and a LOCAL top-k all happen
         vectorized, so the driver merges n_parts × k candidate rows,
         never a full per-order table, and there is no third exchange for
         the aggregate.

    Date/segment filters are applied at the scan (arrow compute on the
    streamed batches) before anything is shuffled. The customer
    semi-join rides ``adaptive_join`` (broadcast key set under the
    limit, bucketed exchange above), and when the surviving order set
    is broadcastable its keys also PRE-FILTER the lineitem partials, so
    the one remaining exchange carries only matching orders' revenue
    rows."""
    import ray

    from .join import adaptive_join
    from .shuffle import salted_partition_apply

    cut = pa.scalar(pd.Timestamp(cutoff).to_pydatetime(),
                    type=pa.timestamp("us"))

    cust = read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], pa.scalar(segment)))
            .select(["c_custkey"]), batch_format="pyarrow")

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate",
                   "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(pc.less(t["o_orderdate"], cut)),
                     batch_format="pyarrow")
    surviving = adaptive_join(orders, cust, on="o_custkey",
                              right_on="c_custkey", how="semi",
                              broadcast_limit=broadcast_limit) \
        .materialize()
    # broadcast the surviving orders' attrs when small (the usual case:
    # one segment x date filter); the lineitem partials are then
    # key-filtered BEFORE the exchange, which carries only matching
    # orders' revenue rows
    surv_small = surviving.count() <= broadcast_limit
    if surv_small:
        sdf = surviving.to_pandas()
        attrs_ref = ray.put(dict(zip(
            sdf["o_orderkey"].astype("int64"),
            zip(sdf["o_orderdate"], sdf["o_orderpriority"]))))
        key_set = pa.array(sdf["o_orderkey"].astype("int64"),
                           pa.int64())
    else:
        attrs_ref = None
        key_set = None

    line = read(sf_dir, "lineitem",
                ["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    def partial_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        if key_set is not None:
            t = t.filter(pc.is_in(pc.cast(t["l_orderkey"], pa.int64()),
                                  value_set=key_set))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        agg = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev}) \
            .group_by("l_orderkey").aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "rev"])
        n = len(agg)
        return pa.table({
            "l_orderkey": agg["l_orderkey"],
            "o_orderdate": pa.nulls(n, pa.timestamp("us")),
            "o_orderpriority": pa.nulls(n, pa.string()),
            "rev": agg["rev"],
            "side": pa.array(np.full(n, 0, np.int8))})

    both = line.map_batches(partial_rev, batch_format="pyarrow")
    if not surv_small:
        both = both.union(surviving.map_batches(lambda t: pa.table({
            # the union side rides arrow: re-cast so schemas match
            # exactly (ns→us timestamps from pandas blocks)
            "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderdate": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "o_orderpriority": pc.cast(t["o_orderpriority"], pa.string()),
            "rev": pa.nulls(len(t), pa.float64()),
            "side": pa.array(np.full(len(t), 1, np.int8))}),
            batch_format="pyarrow"))

    def part_topk(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["side"] == 0]
        agg = l.groupby("l_orderkey", sort=False)["rev"].sum() \
            .reset_index().rename(columns={"rev": "revenue"})
        if attrs_ref is not None:
            amap = ray.get(attrs_ref)
            hit = agg["l_orderkey"].map(amap)
            m = agg.assign(
                o_orderdate=[p[0] if isinstance(p, tuple) else pd.NaT
                             for p in hit],
                o_orderpriority=[p[1] if isinstance(p, tuple) else None
                                 for p in hit])
        else:
            o = df[df["side"] == 1]
            m = agg.merge(o[["l_orderkey", "o_orderdate",
                             "o_orderpriority"]],
                          on="l_orderkey", how="inner")
        return m.sort_values(["revenue", "l_orderkey"],
                             ascending=[False, True],
                             kind="mergesort").head(k)

    df = salted_partition_apply(
        both, part_topk,
        combine_key=lambda t: t["l_orderkey"].to_numpy()).to_pandas() \
        .sort_values(["revenue", "l_orderkey"], ascending=[False, True],
                     kind="mergesort").head(k).reset_index(drop=True)
    df["revenue"] = df["revenue"].round(2)
    return df[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]


def revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): order revenue per nation, with
    region subtotals and a grand total ('ALL' sentinel rows, COALESCE
    form). Scale shape: one bucketed hash_join orders ⋈ customer, the
    25-row nation⋈region dim broadcast onto the joined stream, a single
    distributed (region, nation) aggregate — the rollup levels are then
    derived by re-aggregating the ≤|nations| result rows, never the
    facts."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .join import hash_join

    nation = read(sf_dir, "nation").to_pandas()
    region = read(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey",
                       right_on="r_regionkey")[["n_nationkey", "n_name",
                                                "r_name"]]
    dref = ray.put(dim.set_index("n_nationkey"))

    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j = hash_join(orders, cust, on="o_custkey", right_on="c_custkey")

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(dref)
        return batch.join(d, on="c_nationkey", how="inner")[
            ["r_name", "n_name", "o_totalprice"]]

    base = j.map_batches(attach, batch_format="pandas") \
        .groupby(["r_name", "n_name"]) \
        .aggregate(Count(alias_name="n_orders"),
                   Sum("o_totalprice", alias_name="total_price")) \
        .to_pandas()

    per_region = base.groupby("r_name", as_index=False) \
        .agg(n_orders=("n_orders", "sum"), total_price=("total_price", "sum"))
    per_region["n_name"] = "ALL"
    grand = pd.DataFrame({
        "r_name": ["ALL"], "n_name": ["ALL"],
        "n_orders": [base["n_orders"].sum()],
        "total_price": [base["total_price"].sum()]})
    df = pd.concat([base, per_region, grand], ignore_index=True)
    df["n_orders"] = df["n_orders"].astype("int64")
    df["total_price"] = df["total_price"].round(2)
    return df[["r_name", "n_name", "n_orders", "total_price"]] \
        .sort_values(["r_name", "n_name"]).reset_index(drop=True)


def local_supplier_volume(sf_dir: str, region: str = "ASIA",
                          date_from: str = "1996-01-01",
                          date_to: str = "1998-01-01"):
    """TPC-H Q5 shape: revenue per nation from orders in a date range
    whose supplier sits in the CUSTOMER's nation, region-filtered — a
    six-table join. Scale shape: nation⋈region and supplier are true
    dimensions (broadcast once via ray.put); the two fact-fact edges are
    ``adaptive_join``s — orders(filtered)⋈customer on custkey, then
    lineitem⋈that on orderkey. Both small sides are heavily filtered, so
    at sane selectivities they broadcast and the lineitem table streams
    with ZERO exchange; past the broadcast limit each edge degrades to
    the bucketed hash join (two exchanges, the previous shape). The
    s_nationkey = c_nationkey correlation and the per-nation revenue
    partials are row-local arrow/numpy work on the streamed join output;
    only the ≤|nations| aggregate rows reach the driver."""
    import ray
    from ray.data.aggregate import Sum

    from .join import adaptive_join

    lo = pa.scalar(pd.Timestamp(date_from).to_pydatetime(),
                   type=pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(date_to).to_pydatetime(),
                   type=pa.timestamp("us"))

    nation = read(sf_dir, "nation").to_pandas()
    reg = read(sf_dir, "region").to_pandas()
    dim = nation.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim[dim["r_name"] == region]
    nkey_to_name = dict(zip(dim["n_nationkey"].astype(int),
                            dim["n_name"]))
    supp = read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    supp_to_nkey = dict(zip(supp["s_suppkey"].astype(int),
                            supp["s_nationkey"].astype(int)))
    nref = ray.put(nkey_to_name)
    sref = ray.put(supp_to_nkey)

    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                     "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi)))
            .select(["o_orderkey", "o_custkey"]), batch_format="pyarrow")
    cust = read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    region_keys = pa.array(list(nkey_to_name), pa.int32())
    cust = cust.map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"],
                                    value_set=region_keys)),
        batch_format="pyarrow")

    # both join edges ride the runtime broadcast-vs-exchange switch:
    # region-filtered customers and (date x region)-filtered orders are
    # far below the broadcast limit at any sane selectivity, so the
    # lineitem fact table is never exchanged at all; past the limit the
    # same call degrades to the bucketed hash_join
    oc = adaptive_join(orders, cust, on="o_custkey",
                       right_on="c_custkey") \
        .map_batches(lambda t: pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "c_nationkey": pc.cast(t["c_nationkey"], pa.int64())}),
            batch_format="pyarrow")

    line = read(sf_dir, "lineitem",
                ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    lo_j = adaptive_join(line, oc, on="l_orderkey", right_on="o_orderkey")

    def partial_rev(df: pd.DataFrame) -> pd.DataFrame:
        s2n = ray.get(sref)
        n2name = ray.get(nref)
        snk = df["l_suppkey"].map(s2n)
        keep = snk == df["c_nationkey"]
        d = df[keep]
        rev = d["l_extendedprice"] * (1.0 - d["l_discount"])
        out = pd.DataFrame({
            "n_name": d["c_nationkey"].map(n2name), "rev": rev})
        return out.groupby("n_name", as_index=False)["rev"].sum()

    agg = lo_j.map_batches(partial_rev, batch_format="pandas") \
        .groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))
    df = agg.to_pandas()
    df["revenue"] = df["revenue"].round(2)
    return df.sort_values("n_name").reset_index(drop=True)


def percent_rank_by_group(ds, group_col: str, value_col: str,
                          out_col: str = "pct", n_parts: int = 32):
    """Exact SQL ``percent_rank() OVER (PARTITION BY group ORDER BY
    value)`` for EVERY row, without a global sort: the distributed
    two-phase scan idiom (pack_sequences) keyed on the VALUE RANGE.

    Rows are bucketed by value into n_parts contiguous ranges
    (order-functional, so every row with a smaller value is in an
    earlier-or-same part and TIES NEVER STRADDLE PARTS); phase 1
    reduces one (part, group) count table to the driver (n_parts ×
    n_groups rows — partition-scaled, not row-scaled) for the
    per-group exclusive scan; phase 2 ranks inside each part against
    its broadcast base. percent_rank = rank_before / (n_group − 1),
    0.0 for single-row groups (the SQL convention). Calibration use
    case: per-language quality/length percentiles, so thresholds mean
    the same thing in every language (per-group score distributions
    differ; a global cut over-filters low-resource groups).

    Returns a row-scaled Dataset with (group_col, value_col, out_col,
    + any other input columns preserved). Value skew concentrates
    rows in few parts at pathological distributions — acceptable: the
    per-part work is a sort + cumsum, and n_parts can scale."""
    import ray
    from ray.data.aggregate import Count

    vmin = ds.min(on=value_col)
    vmax = ds.max(on=value_col)
    if vmin is None:
        return ds.map_batches(
            lambda t: t.append_column(out_col, pa.array(
                np.zeros(len(t)), pa.float64())),
            batch_format="pyarrow")
    span = max(1.0, (float(vmax) - float(vmin) + 1.0) / n_parts)

    def add_part(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.minimum(((v - float(vmin)) / span), n_parts - 1) \
            .astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow") \
        .materialize()

    counts = parted.groupby(["__part", group_col]) \
        .aggregate(Count(alias_name="n")).to_pandas() \
        .sort_values(["__part"])
    base: dict = {}
    totals: dict = {}
    for g, sub in counts.groupby(group_col, sort=False):
        sub = sub.sort_values("__part")
        cums = np.concatenate([[0], np.cumsum(sub["n"].to_numpy())[:-1]])
        for p, b in zip(sub["__part"], cums):
            base[(int(p), g)] = int(b)
        totals[g] = int(sub["n"].sum())
    ref = ray.put((base, totals))

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        bases, tot = ray.get(ref)
        p = int(df["__part"].iloc[0])
        df = df.sort_values([group_col, value_col], kind="mergesort") \
            .reset_index(drop=True)
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy()
        new_grp = np.empty(len(df), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = g[1:] != g[:-1]
        # rank_before within part: index of the first row of this
        # (group, value) tie-run, relative to the group's start
        new_run = new_grp.copy()
        new_run[1:] |= v[1:] != v[:-1]
        idx = np.arange(len(df))
        run_start = np.maximum.accumulate(np.where(new_run, idx, 0))
        grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        within = run_start - grp_start
        pct = np.empty(len(df), dtype=np.float64)
        for gi in np.nonzero(new_grp)[0]:
            gv = g[gi]
            end = len(df)
            nxt = np.nonzero(new_grp[gi + 1:])[0]
            if len(nxt):
                end = gi + 1 + nxt[0]
            denom = tot[gv] - 1
            b = bases.get((p, gv), 0)
            sl = slice(gi, end)
            pct[sl] = ((b + within[sl]) / denom) if denom > 0 else 0.0
        out = df.drop(columns=["__part"])
        out[out_col] = pct
        return out

    return parted.groupby("__part").map_groups(
        rank_part, batch_format="pandas")


def user_top_event_type(sf_dir: str):
    """Per-group MODE (SQL: row_number over count(*) desc = 1): each
    user's most frequent event type, ties to the lexicographically
    smallest type. Per-batch arrow (user, type) partial counts — the
    combiner — then ONE salted exchange on user_id and a vectorized
    per-part argmax; no per-user dispatch."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "event_type": t["event_type"]}) \
            .group_by(["user_id", "event_type"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "event_type", "n"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "event_type"], sort=False)["n"].sum() \
            .reset_index()
        c = c.sort_values(["n", "event_type"], ascending=[False, True],
                          kind="mergesort")
        top = c.groupby("user_id", sort=False).head(1)
        return top.rename(columns={"event_type": "top_event_type"})

    out = salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"), part_fn,
        combine_key=lambda t: t["user_id"].to_numpy())
    df = out.to_pandas()
    df["n"] = df["n"].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def value_histogram(sf_dir: str, width: float = 10.0):
    """Fixed-width numeric histogram of the event value column
    (floor(value/width)·width bins): per-batch arrow binning + partial
    counts, one tiny groupby — the generic binned-aggregation shape."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["value"])

    def bin_batch(t: pa.Table) -> pa.Table:
        lo = pc.multiply(pc.floor(pc.divide(t["value"],
                                            pa.scalar(width))),
                         pa.scalar(width))
        return pa.table({"bin_lo": lo}).group_by("bin_lo") \
            .aggregate([([], "count_all")]) \
            .rename_columns(["bin_lo", "n_events"])

    df = ds.map_batches(bin_batch, batch_format="pyarrow") \
        .groupby("bin_lo").aggregate(Sum("n_events", alias_name="n_events")) \
        .to_pandas()
    df["n_events"] = df["n_events"].astype("int64")
    df["bin_lo"] = df["bin_lo"].round(6)
    return df.sort_values("bin_lo").reset_index(drop=True)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_hour_pivot(sf_dir: str):
    """PIVOT: event counts by hour-of-day × event_type as a WIDE table
    (one n_<type> column per type) — SQL conditional aggregation
    (``count(*) FILTER (WHERE event_type = ...)``). The pivot happens
    entirely inside ``map_batches`` as a per-batch (24 × n_types)
    partial-count grid (numpy bincount over hour·T+type codes), so the
    exchange is ≤ 24·n_blocks pre-aggregated rows — never the events."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["ts", "event_type"])
    tcode = {t: i for i, t in enumerate(EVENT_TYPES)}
    T = len(EVENT_TYPES)

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.hour(t["ts"]).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # unknown event types bin into an extra "other" code (T): they
        # get no pivot column but DO count into n_total, matching the
        # oracle's count(*) — and never crash the batch
        codes = np.fromiter(
            (tcode.get(v, T) for v in t["event_type"].to_pylist()),
            dtype=np.int64, count=len(t))
        grid = np.bincount(hour * (T + 1) + codes,
                           minlength=24 * (T + 1)).reshape(24, T + 1)
        cols = {"hour": pa.array(np.arange(24, dtype=np.int64))}
        for i, name in enumerate(EVENT_TYPES):
            cols[f"n_{name}"] = pa.array(grid[:, i])
        cols["n_other"] = pa.array(grid[:, T])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour") \
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}")
                     for t in EVENT_TYPES],
                   Sum("n_other", alias_name="n_other"))
    df = agg.to_pandas().sort_values("hour").reset_index(drop=True)
    for t in EVENT_TYPES:
        df[f"n_{t}"] = df[f"n_{t}"].astype("int64")
    df["n_total"] = (sum(df[f"n_{t}"] for t in EVENT_TYPES)
                     + df["n_other"]).astype("int64")
    return df.drop(columns=["n_other"])


def order_rank_windows(sf_dir: str):
    """Grouped ranking windows per customer over order value: SQL
    ``rank() / dense_rank() / row_number() / ntile(4) OVER (PARTITION BY
    o_custkey ORDER BY o_totalprice DESC[, o_orderkey])``. ONE salted
    exchange on custkey, then fully vectorized pandas ranking across all
    of a part's customers at once (no per-customer dispatch). ntile
    reproduces SQL remainder semantics exactly: the first (n mod 4)
    buckets of an n-row group get ceil(n/4) rows."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True], kind="mergesort")
        g = df.groupby("o_custkey", sort=False)
        rn = g.cumcount().to_numpy() + 1
        rnk = g["o_totalprice"].rank(method="min", ascending=False) \
            .to_numpy().astype(np.int64)
        drnk = g["o_totalprice"].rank(method="dense", ascending=False) \
            .to_numpy().astype(np.int64)
        n = g["o_orderkey"].transform("size").to_numpy()
        idx = rn - 1
        buckets = 4
        big = n % buckets                     # first `big` tiles get +1
        size_small = n // buckets
        size_big = size_small + 1
        cut = big * size_big                  # rows covered by big tiles
        in_big = idx < cut
        tile = np.where(
            in_big,
            idx // np.maximum(size_big, 1),
            big + (idx - cut) // np.maximum(size_small, 1)) + 1
        return pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(),
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "o_totalprice": df["o_totalprice"].to_numpy(),
            "rnk": rnk, "drnk": drnk,
            "rn": rn.astype(np.int64),
            "quartile": tile.astype(np.int64)})

    # fact-scaled output: return the Dataset; the oracle wrapper sorts
    return salted_partition_apply(
        ds, part_fn, combine_key=lambda t: t["o_custkey"].to_numpy())


def users_intersect(sf_dir: str, type_a: str = "purchase",
                    type_b: str = "error"):
    """SQL INTERSECT (SURVEY §2.7 set ops): users who performed BOTH
    event types. ONE streamed pass over events (the dominant cost at
    scale is the table read — never pay it twice) emitting per-batch
    distinct (user_id, side) pairs, then one salted exchange on user_id
    where a part keeps users seen on both sides — only int64 ids and a
    side byte ever move."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        users, sides = [], []
        for side_code, et in ((0, type_a), (1, type_b)):
            f = t.filter(pc.equal(t["event_type"], et))
            u = np.unique(f["user_id"].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            users.append(u)
            sides.append(np.full(len(u), side_code, np.int8))
        return pa.table({
            "user_id": pa.array(np.concatenate(users), pa.int64()),
            "side": pa.array(np.concatenate(sides), pa.int8())})

    def both_sides(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["user_id", "side"]) \
            .groupby("user_id", sort=False)["side"].nunique()
        return pd.DataFrame({"user_id": g.index[g == 2].to_numpy()})

    out = salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"), both_sides,
        combine_key=lambda t: t["user_id"].to_numpy())
    df = out.to_pandas()
    df["user_id"] = df["user_id"].astype("int64")
    return df.sort_values("user_id").reset_index(drop=True)


def event_value_stats(sf_dir: str):
    """Distributed moment statistics per event type: mean, sample
    stddev, and corr(value, hour-of-day) from ONE streamed pass of
    sufficient statistics (n, Σx, Σx², Σy, Σy², Σxy per batch) + a tiny
    groupby — the canonical way variance/correlation distribute without
    a second pass or any raw-value shuffle."""
    from ray.data.aggregate import Sum

    ds = read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pylist(),
            "x": t["value"].to_numpy(zero_copy_only=False)
            .astype(np.float64),
            "y": pc.hour(t["ts"]).to_numpy(zero_copy_only=False)
            .astype(np.float64),
        })
        df["xx"] = df["x"] * df["x"]
        df["yy"] = df["y"] * df["y"]
        df["xy"] = df["x"] * df["y"]
        g = df.groupby("event_type", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sxx=("xx", "sum"),
            sy=("y", "sum"), syy=("yy", "sum"), sxy=("xy", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"), Sum("sy", alias_name="sy"),
                   Sum("syy", alias_name="syy"),
                   Sum("sxy", alias_name="sxy")).to_pandas()
    n = agg["n"].to_numpy(np.float64)
    sx, sxx = agg["sx"].to_numpy(), agg["sxx"].to_numpy()
    sy, syy = agg["sy"].to_numpy(), agg["syy"].to_numpy()
    sxy = agg["sxy"].to_numpy()
    mean = sx / n
    # SQL NULL edges reproduced as NaN (DuckDB's .df() renders NULL as
    # NaN for float columns): stddev_samp is NULL at n==1; corr is NULL
    # when either side has zero variance
    with np.errstate(invalid="ignore", divide="ignore"):
        # clamp to 0: a constant-valued group cancels to ~-1e-18 in
        # float64 and sqrt of that is NaN where SQL stddev_samp says 0
        var = np.where(n > 1,
                       np.maximum(sxx - sx * sx / n, 0.0)
                       / np.maximum(n - 1, 1), np.nan)
        cov = n * sxy - sx * sy
        den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        corr = np.where(den > 0, cov / np.where(den > 0, den, 1.0), np.nan)
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n_events": agg["n"].astype("int64"),
        "mean_value": np.round(mean, 6),
        "stddev_value": np.round(np.sqrt(var), 6),
        "corr_value_hour": np.round(corr, 6),
    })
    return out.sort_values("event_type").reset_index(drop=True)


def group_median(ds, group_col: str, value_col: str,
                 out_col: str = "median_val", n_parts: int = 64,
                 ndigits: int = 2) -> pd.DataFrame:
    """EXACT per-group median (SQL ``median()`` / quantile_cont(0.5),
    linear interpolation on even counts): one key-functional salted
    exchange co-locates each group, a vectorized per-part grouped
    median finishes. The right shape for HIGH-cardinality groups (a
    group's rows must fit one part — per-customer, per-host, per-doc
    keys); for a handful of giant groups use the streamed quantile
    sketch (textstats.token_quantiles machinery) instead."""
    from .join import _key_to_int64
    from .shuffle import salted_partition_apply

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(group_col, sort=False)[value_col].median() \
            .reset_index(name=out_col)
        return out

    out = salted_partition_apply(
        ds, part_fn, lambda t: _key_to_int64(t, group_col),
        n_parts=n_parts).to_pandas()
    out[out_col] = out[out_col].round(ndigits)
    return out.sort_values(group_col).reset_index(drop=True)


def customer_median_order(sf_dir: str) -> pd.DataFrame:
    """Exact median order price per customer — the per-entity exact
    median over ~150k·SF groups (group_median's intended regime)."""
    orders = read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    out = group_median(orders, "o_custkey", "o_totalprice",
                       out_col="median_price")
    out["o_custkey"] = out["o_custkey"].astype("int64")
    return out


def small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape — a fact table filtered against ITS OWN per-key
    aggregate: yearly-average revenue lost to small orders, i.e.
    sum(l_extendedprice)/7 over lineitems with l_quantity < 0.2 × that
    part's average quantity. Scale shape: per-batch (partkey, Σqty, n)
    combiner partials → one part-scaled groupby → the avg table joins
    BACK onto the streaming lineitem via the runtime broadcast-vs-
    exchange switch — the fact table is read once and never exchanged
    on the broadcast path."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .join import adaptive_join

    li = read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"])

    def qty_partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_partkey": t["l_partkey"].to_numpy(zero_copy_only=False),
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)})
        g = df.groupby("l_partkey", sort=False)["q"] \
            .agg(["sum", "size"]).reset_index()
        return pa.table({
            "l_partkey": pa.array(g["l_partkey"].to_numpy(), pa.int64()),
            "qsum": pa.array(g["sum"].to_numpy(), pa.float64()),
            "qn": pa.array(g["size"].to_numpy(), pa.int64())})

    avg = li.map_batches(qty_partials, batch_format="pyarrow") \
        .groupby("l_partkey") \
        .aggregate(Sum("qsum", alias_name="s"),
                   Sum("qn", alias_name="n"))

    def to_threshold(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        # same double ops as SQL's 0.2 * avg(l_quantity)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "thresh": pa.array(0.2 * (s / n), pa.float64())})

    thresh = avg.map_batches(to_threshold, batch_format="pyarrow")
    j = adaptive_join(li, thresh, on="l_partkey")

    def partial_rev(t: pa.Table) -> pa.Table:
        keep = pc.less(t["l_quantity"], t["thresh"])
        kept = pc.sum(pc.if_else(keep, t["l_extendedprice"],
                                 pa.scalar(0.0))).as_py() or 0.0
        return pa.table({"rev": pa.array([kept], pa.float64())})

    total = j.map_batches(partial_rev, batch_format="pyarrow") \
        .to_pandas()["rev"].sum()
    return pd.DataFrame({"avg_yearly": [round(total / 7.0, 2)]})


def user_value_moving_avg(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """ROWS-frame window (SQL ``AVG(value) OVER (PARTITION BY user_id
    ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)``):
    per-user moving average over the previous ``window`` events. One
    user-keyed salted exchange; the per-part pass is pandas grouped
    rolling (vectorized C path)."""
    from .shuffle import salted_partition_apply

    ev = read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        m = df.groupby("user_id", sort=False)["value"] \
            .rolling(window, min_periods=1).mean() \
            .reset_index(drop=True)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "mavg": np.round(m.to_numpy(), 4)})

    out = salted_partition_apply(
        ev, part_fn,
        lambda t: t["user_id"].to_numpy(zero_copy_only=False)
        .astype(np.int64)).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)


def grouping_sets_aggregate(ds, keys: list[str], sums: dict[str, str],
                            sets: list[list[str]]):
    """GROUP BY GROUPING SETS — the general subtotal lattice (ROLLUP
    and CUBE are the prefix / power-set specialisations below).

    Scale shape: one leaf-level exchange over the FULL key tuple
    (per-batch combiner partials → groupby), then every other grouping
    set re-aggregates the LEAF Dataset (cardinality = distinct leaf
    groups, not corpus rows) with its own combine + tiny groupby —
    every level stays Dataset-resident, so a billion-row fact table
    pays one wide exchange plus len(sets) exchanges over the (small)
    group table. ``sums`` maps output name → source column; ``n_rows``
    (int64 count) is always emitted. Rows of a set carry NULL in the
    key columns the set omits, exactly like SQL.
    """
    from ray.data.aggregate import Sum

    out_names = list(sums)
    norm_sets = [list(s) for s in sets]
    for s in norm_sets:
        if not set(s) <= set(keys):
            raise ValueError(f"grouping set {s} not a subset of {keys}")
    if keys not in norm_sets:
        norm_sets.insert(0, list(keys))

    def leaf_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        agg = g.agg(**{o: (c, "sum") for o, c in sums.items()})
        # sums ride as float64 so every level (incl. the driver-built
        # grand-total row) unions with an identical schema
        agg = agg.astype({o: np.float64 for o in out_names})
        agg["n_rows"] = g.size()
        return pa.Table.from_pandas(agg.reset_index(),
                                    preserve_index=False)

    # materialize ONCE: every grouping set re-reads the leaf table, and
    # without this each one would re-execute the wide corpus exchange.
    # The leaf is group-scaled (distinct full-key tuples), not
    # corpus-scaled, so pinning it in the object store is bounded.
    leaf = ds.map_batches(leaf_partial, batch_format="pyarrow") \
        .groupby(keys).aggregate(
            *[Sum(o, alias_name=o) for o in out_names],
            Sum("n_rows", alias_name="n_rows")).materialize()

    key_types = {k: pa.string() for k in keys}

    def pad_level(level_keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for k in keys:
                cols[k] = (t[k] if k in level_keys
                           else pa.nulls(len(t), key_types[k]))
            for o in out_names + ["n_rows"]:
                cols[o] = t[o]
            return pa.table(cols)
        return fn

    import ray.data as rd

    levels = []
    for lvl_keys in norm_sets:
        if lvl_keys == list(keys):
            levels.append(leaf.map_batches(pad_level(keys),
                                           batch_format="pyarrow"))
            continue
        if not lvl_keys:
            # grand total: a streaming scalar aggregate, one row
            tot = leaf.aggregate(*[Sum(o, alias_name=o)
                                   for o in out_names + ["n_rows"]])
            levels.append(rd.from_arrow(pa.table(
                {**{k: pa.nulls(1, key_types[k]) for k in keys},
                 **{o: pa.array([tot[o]], pa.float64())
                    for o in out_names},
                 "n_rows": pa.array([int(tot["n_rows"])], pa.int64())})))
            continue

        def repartial(t: pa.Table, _keys=tuple(lvl_keys)) -> pa.Table:
            df = t.to_pandas()
            g = df.groupby(list(_keys), sort=False, dropna=False)[
                out_names + ["n_rows"]].sum()
            return pa.Table.from_pandas(g.reset_index(),
                                        preserve_index=False)

        lvl = leaf.map_batches(repartial, batch_format="pyarrow") \
            .groupby(lvl_keys).aggregate(
                *[Sum(o, alias_name=o)
                  for o in out_names + ["n_rows"]])
        levels.append(lvl.map_batches(pad_level(lvl_keys),
                                      batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_aggregate(ds, keys: list[str], sums: dict[str, str]):
    """GROUP BY ROLLUP(keys): the prefix grouping sets, coarse→total."""
    sets = [list(keys[:k]) for k in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, sums, sets)


def cube_aggregate(ds, keys: list[str], sums: dict[str, str]):
    """GROUP BY CUBE(keys): every key subset (2^k sets — keep k small,
    as any OLAP engine does; each non-leaf set costs one group-table
    exchange)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, sums, sets)


def lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP (l_returnflag, l_linestatus) with quantity/price subtotals
    — leaf + per-status + grand-total rows, NULLs mark rolled-up keys."""
    li = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice"])
    ds = rollup_aggregate(li, ["l_returnflag", "l_linestatus"],
                          {"sum_qty": "l_quantity",
                           "sum_price": "l_extendedprice"})
    df = ds.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_price"] = df["sum_price"].round(2)
    df["n_rows"] = df["n_rows"].astype("int64")
    return df.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first") \
        .reset_index(drop=True)


def late_item_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape — correlated EXISTS decorrelated: orders counted
    per priority where ANY lineitem shipped after the order date. The
    correlation predicate needs both sides' columns, so this is an
    order-keyed co-location (not a pure semi-join): one tagged-union
    exchange on the order key, per-part vectorized merge + predicate +
    per-order ANY, then combiner partials into a tiny priority groupby.
    """
    from .join import _key_to_int64
    from .shuffle import salted_partition_apply

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def pad_orders(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"],
            "o_orderpriority": t["o_orderpriority"],
            "l_shipdate": pa.nulls(len(t), pa.timestamp("us")),
        })

    def pad_li(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["l_orderkey"],
            "o_orderdate": pa.nulls(len(t), pa.timestamp("us")),
            "o_orderpriority": pa.nulls(len(t), pa.string()),
            "l_shipdate": t["l_shipdate"],
        })

    both = orders.map_batches(pad_orders, batch_format="pyarrow") \
        .union(li.map_batches(pad_li, batch_format="pyarrow"))

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["o_orderdate"].notna()][
            ["o_orderkey", "o_orderdate", "o_orderpriority"]]
        l = df[df["l_shipdate"].notna()][["o_orderkey", "l_shipdate"]]
        m = o.merge(l, on="o_orderkey", how="inner")
        hit = m.loc[m["l_shipdate"] > m["o_orderdate"], "o_orderkey"] \
            .unique()
        sub = o[o["o_orderkey"].isin(hit)]
        return sub.groupby("o_orderpriority", sort=False) \
            .size().rename("n_orders").reset_index()

    parts = salted_partition_apply(
        both, part_fn,
        combine_key=lambda t: _key_to_int64(t, "o_orderkey"))
    df = parts.groupby("o_orderpriority").sum("n_orders").to_pandas()
    df = df.rename(columns={"sum(n_orders)": "n_orders"})
    df["n_orders"] = df["n_orders"].astype("int64")
    return df.sort_values("o_orderpriority").reset_index(drop=True)


def lineitem_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE (l_returnflag, l_linestatus) — adds the
    non-prefix (l_linestatus)-only marginal ROLLUP can't express."""
    li = read(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_quantity",
               "l_extendedprice"])
    ds = cube_aggregate(li, ["l_returnflag", "l_linestatus"],
                        {"sum_qty": "l_quantity",
                         "sum_price": "l_extendedprice"})
    df = ds.to_pandas()
    df["sum_qty"] = df["sum_qty"].round(2)
    df["sum_price"] = df["sum_price"].round(2)
    df["n_rows"] = df["n_rows"].astype("int64")
    return df.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first") \
        .reset_index(drop=True)


def waiting_suppliers(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """TPC-H Q21 shape — the double correlated subquery (EXISTS another
    supplier in the order + NOT EXISTS another LATE supplier): for
    finished ('F') orders, count per supplier the orders where that
    supplier was the SOLE late shipper (l_shipdate > o_orderdate) among
    ≥2 distinct suppliers.

    Decorrelation: both subqueries range over the same order's
    lineitems, so ONE order-keyed co-location exchange makes them
    part-local — per part, a vectorized groupby derives each order's
    distinct-supplier count and late-supplier set, and qualifying
    (order, supplier) pairs reduce to combiner partials + a tiny
    supplier groupby. No per-order dispatch, no row explosion."""
    from .join import _key_to_int64
    from .shuffle import salted_partition_apply

    orders = read(sf_dir, "orders",
                  ["o_orderkey", "o_orderdate", "o_orderstatus"])
    li = read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_shipdate"])

    def pad_orders(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderstatus"], "F")
        t = t.filter(keep)
        return pa.table({
            "okey": t["o_orderkey"],
            "odate": t["o_orderdate"],
            "suppkey": pa.nulls(len(t), pa.int64()),
            "sdate": pa.nulls(len(t), pa.timestamp("us")),
        })

    def pad_li(t: pa.Table) -> pa.Table:
        return pa.table({
            "okey": t["l_orderkey"],
            "odate": pa.nulls(len(t), pa.timestamp("us")),
            "suppkey": t["l_suppkey"],
            "sdate": t["l_shipdate"],
        })

    both = orders.map_batches(pad_orders, batch_format="pyarrow") \
        .union(li.map_batches(pad_li, batch_format="pyarrow"))

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["odate"].notna()][["okey", "odate"]]
        l = df[df["suppkey"].notna()][["okey", "suppkey", "sdate"]]
        m = l.merge(o, on="okey", how="inner")
        if m.empty:
            return pd.DataFrame({"suppkey": pd.Series([], dtype="int64"),
                                 "n_orders": pd.Series([], dtype="int64")})
        m["late"] = m["sdate"] > m["odate"]
        per = m.groupby(["okey", "suppkey"], sort=False)["late"] \
            .any().reset_index()
        stats = per.groupby("okey", sort=False)["late"] \
            .agg(n_supp="size", n_late="sum")
        per = per.merge(stats, on="okey")
        qual = per[per["late"] & (per["n_supp"] >= 2)
                   & (per["n_late"] == 1)]
        return qual.groupby("suppkey", sort=False) \
            .size().rename("n_orders").reset_index()

    parts = salted_partition_apply(
        both, part_fn,
        combine_key=lambda t: _key_to_int64(t, "okey"))
    df = parts.groupby("suppkey").sum("n_orders").to_pandas()
    df = df.rename(columns={"sum(n_orders)": "n_orders"})
    df["suppkey"] = df["suppkey"].astype("int64")
    df["n_orders"] = df["n_orders"].astype("int64")
    return df.sort_values(["n_orders", "suppkey"],
                          ascending=[False, True]) \
        .head(k).reset_index(drop=True)


def order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape — the distribution of per-customer order counts,
    INCLUDING never-ordered customers, with an excluded order class
    (urgent orders don't count toward activity; stands in for Q13's
    comment-pattern exclusion — this corpus has no o_comment).

    Scale shape: no LEFT JOIN at fact scale. Per-customer counts come
    from arrow per-batch partials + one salted custkey exchange (the
    exchange carries at most |customers| pre-combined rows, not
    |orders|); the count→customers distribution reduces to per-part
    bucket partials, and the zero bucket is algebraic — |customer| −
    |customers with a qualifying order| (valid under TPC-H FK
    integrity, which the generator guarantees and the oracle's LEFT
    JOIN re-derives independently). Only O(#distinct counts) rows ever
    reach the driver."""
    from .shuffle import salted_partition_apply

    orders = read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_orderpriority"], "1-URGENT"))
        agg = pa.table({"o_custkey": t["o_custkey"]}) \
            .group_by("o_custkey").aggregate([("o_custkey", "count")])
        return agg.rename_columns(["o_custkey", "n"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("o_custkey", sort=False)["n"].sum()
        dist = per.value_counts()
        return pd.DataFrame({
            "n_orders": dist.index.to_numpy().astype("int64"),
            "n_customers": dist.to_numpy().astype("int64")})

    parts = salted_partition_apply(
        orders.map_batches(partial, batch_format="pyarrow"), final,
        combine_key=lambda t: t["o_custkey"].to_numpy().astype("int64"))
    dist = parts.to_pandas() \
        .groupby("n_orders", as_index=False)["n_customers"].sum()
    n_cust = read(sf_dir, "customer", ["c_custkey"]).count()
    n_zero = int(n_cust) - int(dist["n_customers"].sum())
    if n_zero:
        dist = pd.concat([dist, pd.DataFrame(
            {"n_orders": [0], "n_customers": [n_zero]})],
            ignore_index=True)
    dist["n_orders"] = dist["n_orders"].astype("int64")
    dist["n_customers"] = dist["n_customers"].astype("int64")
    return dist.sort_values(["n_customers", "n_orders"],
                            ascending=[False, False]) \
        .reset_index(drop=True)


def supplier_cnt_by_part(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape — per-(brand, size) COUNT(DISTINCT supplier)
    over the lineitem part-supplier relation, excluding a broadcast
    NOT-IN set (suppliers in deficit; stands in for Q16's complaint
    suppliers — this corpus has no s_comment).

    Scale shape: part attributes and the exclusion set are dimension
    data (one ray.put each, read per batch, never exchanged); lineitem
    streams through a per-batch attach + drop_duplicates combiner so
    the ONE exchange carries distinct (brand, size, suppkey) triples —
    duplicate-free volume, not fact volume. The composite salt key is a
    mixed hash of all three columns, so every copy of a triple lands in
    one part and per-part distinct counts sum exactly; the final
    (brand, size) recombine is group-table-sized."""
    import ray

    from .shuffle import salted_partition_apply

    part = read(sf_dir, "part",
                ["p_partkey", "p_brand", "p_size"]).to_pandas()
    supp = read(sf_dir, "supplier",
                ["s_suppkey", "s_acctbal"]).to_pandas()
    excl = frozenset(supp.loc[supp["s_acctbal"] < 0,
                              "s_suppkey"].astype(int))
    pref = ray.put(part)
    xref = ray.put(excl)

    li = read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(pref)
        x = ray.get(xref)
        df = df[~df["l_suppkey"].isin(x)]
        m = df.merge(p, left_on="l_partkey", right_on="p_partkey",
                     how="inner")[["p_brand", "p_size", "l_suppkey"]] \
            .drop_duplicates()
        h = pd.util.hash_pandas_object(m["p_brand"],
                                       index=False).to_numpy()
        ck = (h * np.uint64(1000003)
              + m["p_size"].to_numpy().astype(np.uint64)
              * np.uint64(2654435761)
              + m["l_suppkey"].to_numpy().astype(np.uint64))
        return m.assign(ckey=ck.view(np.int64))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # dedup on the REAL triple, not the 64-bit fold: ckey is the
        # partition key only, and a colliding distinct triple would
        # co-locate here and silently undercount (review finding)
        d = df.drop_duplicates(["p_brand", "p_size", "l_suppkey"])
        out = d.groupby(["p_brand", "p_size"], sort=False,
                        as_index=False).size()
        return out.rename(columns={"size": "supplier_cnt"})

    parts = salted_partition_apply(
        li.map_batches(attach, batch_format="pandas"), per_part,
        combine_key=lambda t: t["ckey"].to_numpy())
    df = parts.to_pandas().groupby(["p_brand", "p_size"],
                                   as_index=False)["supplier_cnt"].sum()
    df["p_size"] = df["p_size"].astype("int64")
    df["supplier_cnt"] = df["supplier_cnt"].astype("int64")
    return df.sort_values(["supplier_cnt", "p_brand", "p_size"],
                          ascending=[False, True, True]) \
        .reset_index(drop=True)


def idle_customer_balance(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape — customers with an above-average positive
    account balance and ZERO event activity, rolled up per market
    segment (events stand in for Q22's orders — this generator gives
    every customer orders, but not every customer events).

    Scale shape: the scalar subquery is a streamed (sum, n) partial
    reduce whose single float broadcasts into the filter closure; NOT
    EXISTS is the one-exchange anti-join (the events side ships only
    its distinct key column into each part); the rollup is a tiny
    groupby. The threshold is rounded to 6 dp on BOTH sides so the
    engine's partial-sum order and the oracle's sum order cannot flip a
    boundary row."""
    from ray.data.aggregate import Count, Sum

    from .join import hash_join

    def psum(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["c_acctbal"], 0.0))
        s = pc.sum(pos["c_acctbal"]).as_py() or 0.0
        return pa.table({"s": pa.array([s], pa.float64()),
                         "n": pa.array([len(pos)], pa.int64())})

    bal = read(sf_dir, "customer", ["c_acctbal"]) \
        .map_batches(psum, batch_format="pyarrow").to_pandas()
    avg = round(float(bal["s"].sum()) / float(bal["n"].sum()), 6)

    cust = read(sf_dir, "customer",
                ["c_custkey", "c_acctbal", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(pc.greater(t["c_acctbal"], avg)),
                     batch_format="pyarrow")
    events = read(sf_dir, "events", ["user_id"])
    idle = hash_join(cust, events, on="c_custkey", right_on="user_id",
                     how="anti")
    agg = idle.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_custs"),
        Sum("c_acctbal", alias_name="total_acctbal"))
    df = agg.to_pandas()
    df["n_custs"] = df["n_custs"].astype("int64")
    df["total_acctbal"] = df["total_acctbal"].round(2)
    return df.sort_values("c_mktsegment").reset_index(drop=True)


def ntile_by_group(ds, group_col: str, value_col: str, tie_col: str,
                   n: int, out_col: str = "tile", n_parts: int = 32):
    """Exact SQL ``ntile(n) OVER (PARTITION BY group ORDER BY value,
    tie)`` for every row — the percent_rank_by_group two-phase
    value-range scan, specialized to a UNIQUE composite order: rows
    bucket by contiguous value range (equal values never straddle
    parts), phase 1 ships one (part, group) count table to the driver
    for the per-group exclusive scan, phase 2 sorts each part by
    (group, value, tie) so global row_number = broadcast base + local
    offset, and the tile is pure arithmetic on it (SQL semantics: the
    first N%n tiles get one extra row). Nothing row-scaled leaves the
    cluster; the returned Dataset streams."""
    import ray
    from ray.data.aggregate import Count

    vmin = ds.min(on=value_col)
    if vmin is None:
        # empty / all-null input — same guard as percent_rank_by_group
        # (review finding: float(None) raised here)
        return ds.limit(0)
    vmax = ds.max(on=value_col)
    span = max(1.0, (float(vmax) - float(vmin) + 1.0) / n_parts)

    def add_part(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.minimum(((v - float(vmin)) / span), n_parts - 1) \
            .astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow") \
        .materialize()

    counts = parted.groupby(["__part", group_col]) \
        .aggregate(Count(alias_name="cnt")).to_pandas()
    base: dict = {}
    totals: dict = {}
    for g, sub in counts.groupby(group_col, sort=False):
        sub = sub.sort_values("__part")
        cums = np.concatenate([[0], np.cumsum(sub["cnt"].to_numpy())[:-1]])
        for p, b in zip(sub["__part"], cums):
            base[(int(p), g)] = int(b)
        totals[g] = int(sub["cnt"].sum())
    ref = ray.put((base, totals))

    def tile_part(df: pd.DataFrame) -> pd.DataFrame:
        bases, tot = ray.get(ref)
        p = int(df["__part"].iloc[0])
        df = df.sort_values([group_col, value_col, tie_col],
                            kind="mergesort").reset_index(drop=True)
        g = df[group_col].to_numpy()
        new_grp = np.empty(len(df), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = g[1:] != g[:-1]
        idx = np.arange(len(df))
        grp_start = np.maximum.accumulate(np.where(new_grp, idx, 0))
        off = np.array([bases.get((p, gv), 0) for gv in g[new_grp]],
                       dtype=np.int64)
        run_lengths = np.diff(np.append(np.nonzero(new_grp)[0],
                                        len(df)))
        rn0 = (idx - grp_start) + np.repeat(off, run_lengths)
        # per-GROUP-RUN Python lookups repeated over runs — the
        # per-row comprehension was the phase-2 hot-path (review)
        N = np.repeat(np.array([tot[gv] for gv in g[new_grp]],
                               dtype=np.int64), run_lengths)
        q, r = N // n, N % n
        big = r * (q + 1)
        tile0 = np.where(rn0 < big, rn0 // np.maximum(q + 1, 1),
                         r + (rn0 - big) // np.maximum(q, 1))
        out = df.drop(columns=["__part"])
        out[out_col] = (tile0 + 1).astype("int64")
        return out

    return parted.groupby("__part").map_groups(
        tile_part, batch_format="pandas")


def order_price_quartiles(sf_dir: str):
    """NTILE(4) per order priority over total price — the
    equal-frequency binning window (quartile assignment for
    calibration / stratification), exact and distributed via
    ntile_by_group. Returns the row-scaled Dataset."""
    ds = read(sf_dir, "orders",
              ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return ntile_by_group(ds, "o_orderpriority", "o_totalprice",
                          "o_orderkey", 4)


def trending_event_types(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-window trending top-k: tumbling 1-hour windows, each
    window's k most frequent event types (rank by count desc, type
    asc). The count is a streamed per-batch partial + one tiny
    (window, type) groupby — partition-scaled, never row-scaled; the
    top-k selection runs on that aggregate table."""
    from ray.data.aggregate import Count

    ev = read(sf_dir, "events", ["ts", "event_type"])

    def to_window(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, 3600000000), 3600000000)
        return pa.table({
            "window_start": pc.cast(win, pa.timestamp("us")),
            "event_type": t["event_type"]})

    agg = ev.map_batches(to_window, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Count(alias_name="n_events")).to_pandas()
    agg = agg.sort_values(["window_start", "n_events", "event_type"],
                          ascending=[True, False, True])
    agg["rnk"] = agg.groupby("window_start", sort=False).cumcount() + 1
    out = agg[agg["rnk"] <= k].reset_index(drop=True)
    out["n_events"] = out["n_events"].astype("int64")
    out["rnk"] = out["rnk"].astype("int64")
    return out


def session_paths(sf_dir: str, gap_minutes: int = 30,
                  k: int = 10) -> pd.DataFrame:
    """Sequence mining over sessions: the top-k within-session
    event-type TRIGRAMS (e1>e2>e3 in timestamp order), the classic
    clickstream path report. One salted exchange on user_id (every
    user's events co-locate), then a fully vectorized per-part pass:
    session ids are one cumsum over (new-user | gap-exceeded) flags,
    trigrams are three shifted object-array concats filtered to
    same-session triples, and each part emits PARTIAL path counts —
    the driver sees only the path-vocabulary-scaled sum. Ordering ties
    are broken by event_id on BOTH sides so same-timestamp events
    cannot flip a path."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events", ["user_id", "ts", "event_id",
                                 "event_type"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def part_fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"path": pd.Series(dtype="object"),
                              "n_occ": pd.Series(dtype="int64")})
        if len(df) < 3:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"],
                            kind="mergesort")
        new_user = df["user_id"] != df["user_id"].shift()
        gap_break = df["ts"].diff() > gap
        sid = (new_user | gap_break).cumsum().to_numpy()
        e = df["event_type"].to_numpy(dtype=object)
        same = (sid[:-2] == sid[1:-1]) & (sid[:-2] == sid[2:])
        if not same.any():
            return empty
        path = e[:-2] + ">" + e[1:-1] + ">" + e[2:]
        vc = pd.Series(path[same]).value_counts()
        return pd.DataFrame({"path": vc.index.to_numpy(),
                             "n_occ": vc.to_numpy().astype("int64")})

    parts = salted_partition_apply(
        ds, part_fn, combine_key=lambda t: t["user_id"].to_numpy())
    df = parts.to_pandas().groupby("path", as_index=False)["n_occ"].sum()
    df["n_occ"] = df["n_occ"].astype("int64")
    return df.sort_values(["n_occ", "path"], ascending=[False, True]) \
        .head(k).reset_index(drop=True)


def event_value_zscores(sf_dir: str):
    """Per-type standardization (anomaly calibration): every event's
    value as a z-score against its event_type's sample mean/stddev.
    Three streamed passes, nothing fact-scaled on the driver: pass 1
    reduces (n, Σx) partials to per-type MEANS, pass 2 sums the
    SHIFTED squares Σ(x−mean)² against the broadcast means (the
    textbook s2 − n·mean² form cancels catastrophically when
    |mean| ≫ std — review finding; the shifted sum is what DuckDB's
    stddev_samp effectively computes), and pass 3 is the row-local
    annotate. z is rounded to 4 dp on both engine and oracle sides so
    the partial-sum order can't flip a digit; a zero/singleton-std
    type yields z = 0 by convention."""
    import ray

    ds = read(sf_dir, "events", ["event_id", "event_type", "value"])
    ds = ds.materialize()   # three passes share one execution

    def sums(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "v": t["value"].to_numpy(zero_copy_only=False)
                           .astype(np.float64)})
        agg = df.groupby("event_type", sort=False)["v"] \
            .agg(n="size", s="sum")
        return pa.Table.from_pandas(agg.reset_index(),
                                    preserve_index=False)

    mom = ds.map_batches(sums, batch_format="pyarrow").to_pandas() \
        .groupby("event_type", as_index=False).sum()
    n = mom["n"].to_numpy().astype(np.float64)
    mean = mom["s"].to_numpy() / n
    means = {t: float(m) for t, m in zip(mom["event_type"], mean)}
    mref = ray.put(means)

    def shifted_sq(t: pa.Table) -> pa.Table:
        mn = ray.get(mref)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "v": t["value"].to_numpy(zero_copy_only=False)
                           .astype(np.float64)})
        df["v"] = (df["v"] - df["event_type"].map(mn)) ** 2
        agg = df.groupby("event_type", sort=False)["v"] \
            .agg(ss="sum")
        return pa.Table.from_pandas(agg.reset_index(),
                                    preserve_index=False)

    ssq = ds.map_batches(shifted_sq, batch_format="pyarrow") \
        .to_pandas().groupby("event_type", as_index=False).sum()
    ssq = mom[["event_type"]].merge(ssq, on="event_type")
    var = np.where(n > 1, ssq["ss"].to_numpy() / np.maximum(n - 1, 1),
                   0.0)
    std = np.sqrt(np.maximum(var, 0.0))
    stats = {t: (means[t], float(sd)) for t, sd in
             zip(mom["event_type"], std)}
    ref = ray.put(stats)

    def annotate(t: pa.Table) -> pa.Table:
        st = ray.get(ref)
        types = t["event_type"].to_pylist()
        v = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        ms = np.array([st[x][0] for x in types])
        sd = np.array([st[x][1] for x in types])
        z = np.where(sd > 0.0, (v - ms) / np.where(sd > 0, sd, 1.0), 0.0)
        return pa.table({
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "zscore": pa.array(np.round(z, 4), pa.float64())})

    return ds.map_batches(annotate, batch_format="pyarrow")


def event_rate_spikes(sf_dir: str, factor: float = 2.0):
    """Windowed-rate anomaly report: per (event_type, 1h tumbling
    window), flag windows whose count exceeds ``factor`` × the trailing
    mean of the previous three ACTIVE windows — the ROWS-frame
    semantics both engine and oracle compute: hour buckets with zero
    events do not appear in the window spine, so after a quiet gap the
    baseline is the last three busy hours, not the empty ones (a dense
    spine / RANGE frame would be the calendar-time variant — review
    note). Only windows with a full 3-active-window history qualify.
    The corpus-scaled work is one streamed
    count pass into a partition-scaled (type, window) aggregate; the
    lag/mean window math runs on that tiny table. Ratios are rounded
    to 4 dp on both sides."""
    from ray.data.aggregate import Count

    ev = read(sf_dir, "events", ["ts", "event_type"])

    def to_window(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        win = pc.multiply(pc.divide(us, 3600000000), 3600000000)
        return pa.table({
            "window_start": pc.cast(win, pa.timestamp("us")),
            "event_type": t["event_type"]})

    agg = ev.map_batches(to_window, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]) \
        .aggregate(Count(alias_name="n_events")).to_pandas() \
        .sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)
    g = agg.groupby("event_type", sort=False)["n_events"]
    trail = (g.shift(1) + g.shift(2) + g.shift(3)) / 3.0
    ratio = (agg["n_events"] / trail).round(4)
    out = agg[trail.notna() & (ratio > factor)].copy()
    out["trailing_mean"] = trail[out.index].round(4)
    out["ratio"] = ratio[out.index]
    out["n_events"] = out["n_events"].astype("int64")
    return out[["event_type", "window_start", "n_events",
                "trailing_mean", "ratio"]] \
        .sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)


def _mass_crossing(ds, group_col: str, value_col: str,
                   weight_col: str, frac: float, n_parts: int):
    """Shared phase 0/1 of the weighted-mass two-phase scans
    (weighted median = frac 0.5; nucleus select = arbitrary frac):
    value-range partition the rows (equal values never straddle
    parts), ship ONE (part, group) weight-sum table to the driver, and
    locate each group's crossing part there. Returns (parted Dataset
    with a __part column, crossing {(part, group): (base_mass,
    target)}), or (None, None) on empty/all-null input. Groups whose
    target is <= 0 (zero total weight, or frac 0) get NO crossing —
    callers treat them as empty, matching SQL's `cum - w < frac*tot`.
    Previously duplicated ~35 lines in both consumers (review
    finding)."""
    from ray.data.aggregate import Sum

    vmin0 = ds.min(on=value_col)
    if vmin0 is None:
        return None, None
    vmin = float(vmin0)
    vmax = float(ds.max(on=value_col))
    span = max(1.0, (vmax - vmin + 1.0) / n_parts)

    def add_part(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        part = np.minimum(((v - vmin) / span), n_parts - 1) \
            .astype(np.int64)
        return t.append_column("__part", pa.array(part, pa.int64()))

    parted = ds.map_batches(add_part, batch_format="pyarrow") \
        .materialize()
    wsum = parted.groupby(["__part", group_col]) \
        .aggregate(Sum(weight_col, alias_name="w")).to_pandas()

    crossing: dict = {}
    for g, sub in wsum.groupby(group_col, sort=False):
        sub = sub.sort_values("__part")
        tot = float(sub["w"].sum())
        target = frac * tot
        if target <= 0:
            continue
        cum = 0.0
        for p, w in zip(sub["__part"], sub["w"]):
            if cum + float(w) >= target:
                crossing[(int(p), g)] = (cum, target)
                break
            cum += float(w)
    return parted, crossing


def weighted_median_by_group(ds, group_col: str, value_col: str,
                             weight_col: str, tie_col: str,
                             n_parts: int = 32) -> pd.DataFrame:
    """Exact WEIGHTED median per group — the value at which half the
    total WEIGHT sits at-or-below (e.g. the doc length below which
    half the corpus CHARS live: a curation statistic the unweighted
    median misstates badly on heavy-tailed lengths). Same two-phase
    value-range scan as percent_rank/ntile: equal values never
    straddle parts, so phase 1 ships one (part, group) weight-sum
    table to the driver, the crossing part per group is located
    there, and phase 2 touches ONLY the crossing (part, group) cells
    (a per-group sort of one part's rows). Nothing row-scaled reaches
    the driver. Contract: ``value_col`` must be integer-valued (the
    median is emitted int64); zero-total-weight groups are OMITTED
    (their weighted median is undefined)."""
    import ray

    parted, crossing = _mass_crossing(ds, group_col, value_col,
                                      weight_col, 0.5, n_parts)
    if parted is None:       # empty / all-null input (review finding)
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "wmedian": pd.Series(dtype="int64")})
    ref = ray.put(crossing)

    def find_median(df: pd.DataFrame) -> pd.DataFrame:
        cr = ray.get(ref)
        p = int(df["__part"].iloc[0])
        out_g, out_v = [], []
        for g, sub in df.groupby(group_col, sort=False):
            hit = cr.get((p, g))
            if hit is None:
                continue
            base, target = hit
            sub = sub.sort_values([value_col, tie_col],
                                  kind="mergesort")
            cum = base + sub[weight_col].to_numpy().cumsum()
            idx = int(np.searchsorted(cum, target, side="left"))
            out_g.append(g)
            out_v.append(sub[value_col].to_numpy()[min(idx,
                                                       len(sub) - 1)])
        return pd.DataFrame({group_col: out_g,
                             "wmedian": pd.Series(out_v,
                                                  dtype="int64")})

    res = parted.groupby("__part").map_groups(
        find_median, batch_format="pandas").to_pandas()
    return res.sort_values(group_col).reset_index(drop=True)


def doc_length_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Per-language char-weighted median document length."""
    ds = read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    return weighted_median_by_group(ds, "lang", "n_chars", "n_chars",
                                    "doc_id")


def mass_fraction_select(ds, group_col: str, order_col: str,
                         weight_col: str, tie_col: str,
                         frac: float = 0.6, n_parts: int = 32):
    """Top-p (nucleus) corpus selection per group: walking each group
    in ``order_col`` order, KEEP rows until ``frac`` of the group's
    total WEIGHT is covered — "the best docs per language until 60 %
    of the char mass". Same two-phase value-range scan as the
    weighted median, generalized to an arbitrary mass target: the
    driver sees one (part, group) weight table, locates each group's
    crossing ROW (order value + tie id, so tie-runs split exactly
    where SQL's running cumsum splits them), and one streamed filter
    keeps rows lexicographically ≤ the broadcast cutoff. Keep rule ≡
    SQL ``cum − w < frac·tot`` (a row is kept iff its mass BEGINS
    before the target) — including the degenerate cases: ``frac=0`` or
    a zero-total-weight group keeps NOTHING on both sides. Contract:
    ``tie_col`` must be integer-valued."""
    import ray

    parted, crossing_part = _mass_crossing(ds, group_col, order_col,
                                           weight_col, frac, n_parts)
    if parted is None:       # empty / all-null input (review finding)
        return ds.limit(0)
    cref = ray.put(crossing_part)

    def find_cutoff(df: pd.DataFrame) -> pd.DataFrame:
        cr = ray.get(cref)
        p = int(df["__part"].iloc[0])
        gs, vs, ts = [], [], []
        for g, sub in df.groupby(group_col, sort=False):
            hit = cr.get((p, g))
            if hit is None:
                continue
            base, target = hit
            sub = sub.sort_values([order_col, tie_col],
                                  kind="mergesort")
            cum = base + sub[weight_col].to_numpy().cumsum()
            idx = int(np.searchsorted(cum, target, side="left"))
            idx = min(idx, len(sub) - 1)
            gs.append(g)
            vs.append(float(sub[order_col].to_numpy()[idx]))
            ts.append(int(sub[tie_col].to_numpy()[idx]))
        return pd.DataFrame({group_col: gs, "cut_v": vs, "cut_t": ts})

    cuts = parted.groupby("__part").map_groups(
        find_cutoff, batch_format="pandas").to_pandas()
    cutoff = {g: (v, t) for g, v, t in
              zip(cuts[group_col], cuts["cut_v"], cuts["cut_t"])}
    kref = ray.put(cutoff)

    def keep(t: pa.Table) -> pa.Table:
        co = ray.get(kref)
        # per-UNIQUE-group lookup, then broadcast via codes — the
        # per-row dict.get comprehension was O(rows) Python (review);
        # a group with NO cutoff (zero-weight / frac=0) keeps nothing
        codes, uniq = pd.factorize(
            pd.Series(t[group_col].to_pandas()), use_na_sentinel=False)
        cvu = np.array([co.get(g, (-np.inf, -1))[0] for g in uniq])
        ctu = np.array([co.get(g, (-np.inf, -1))[1] for g in uniq],
                       dtype=np.int64)
        v = t[order_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ti = t[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cv, ct = cvu[codes], ctu[codes]
        mask = (v < cv) | ((v == cv) & (ti <= ct))
        return t.drop_columns(["__part"]).filter(pa.array(mask))

    return parted.map_batches(keep, batch_format="pyarrow")


def nucleus_doc_select(sf_dir: str, frac: float = 0.6) -> pd.DataFrame:
    """Per-language nucleus selection: keep the LEAST-punctuated docs
    (quality proxy, 4 dp) until ``frac`` of each language's char mass
    is covered. Returns the kept (doc_id, lang, punct_ratio)
    memberships."""
    from .textstats import add_quality_scores

    ds = read(sf_dir, "documents", ["doc_id", "lang", "text"]) \
        .map_batches(add_quality_scores, batch_format="pyarrow") \
        .map_batches(lambda t: t.select(
            ["doc_id", "lang", "punct_ratio", "n_chars_q"]),
            batch_format="pyarrow")
    kept = mass_fraction_select(ds, "lang", "punct_ratio", "n_chars_q",
                                "doc_id", frac=frac)
    df = kept.to_pandas()[["doc_id", "lang", "punct_ratio"]]
    return df.sort_values("doc_id").reset_index(drop=True)


def copurchase_topk(sf_dir: str, k: int = 100,
                    n_parts: int = 64,
                    freq_broadcast_rows: int = 5_000_000
                    ) -> pd.DataFrame:
    """Item-item co-occurrence similarity (market-basket / co-purchase):
    the top-``k`` part pairs by the number of orders that contain BOTH
    parts, annotated with the Jaccard of their order sets — the
    collaborative-filtering / related-items primitive.

    Scale shape (the basket self-join never goes all-pairs global):
      1. per-batch distinct on (order, part) — combiner before the wire;
      2. ONE order-keyed salted exchange co-locates each basket whole,
         so the within-order pair expansion (p1<p2) is part-local
         vectorized pandas (baskets are short — TPC-H ≤7 items; a web
         corpus would cap basket size the same way DISTINCT caps it
         here) and the same pass emits per-part basket-frequency
         partials (tagged p2 = -1) so the frequency table costs no
         second order-keyed exchange;
      3. ONE pair-keyed salted exchange sums partial counts — each pair
         finishes wholly in one part;
      4. Jaccard via the part-frequency table (one row per distinct
         part): broadcast when it fits ``freq_broadcast_rows``, else
         two hash_join shipments (n1 on p1, n2 on p2) — the byte-probed
         broadcast-vs-join switch the dedup family uses, so a 10⁸-part
         catalog never has to fit one worker; then per-block top-k +
         driver merge of ≤ k·n_blocks rows — no global sort of the
         pair table. Path parity is pinned in pytest with a forced-zero
         broadcast limit.

    Returns pandas (p1, p2, co_cnt, union_cnt, jaccard_ppm) ordered by
    (co_cnt desc, p1, p2), k rows. The similarity is emitted as exact
    integers (union = n1 + n2 − co; jaccard_ppm = co·10⁶ // union)
    because Jaccard over small-int sets hits exact decimal ties (1/128
    = 0.0078125) where numpy's half-even and SQL's half-away rounding
    split — integer emission removes the tie class outright."""
    import ray

    from .shuffle import salted_partition_apply

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def batch_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    def order_key(t: pa.Table) -> np.ndarray:
        return t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        # cross-block duplicates of one (order, part) collapse HERE —
        # the order lives wholly in this part
        df = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = df.merge(df, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        pairs = m.groupby(["l_partkey_x", "l_partkey_y"]) \
            .size().reset_index(name="cnt")
        pairs.columns = ["p1", "p2", "cnt"]
        freq = df.groupby("l_partkey").size().reset_index(name="cnt")
        freq = pd.DataFrame({"p1": freq["l_partkey"].astype("int64"),
                             "p2": np.int64(-1), "cnt": freq["cnt"]})
        out = pd.concat([pairs, freq], ignore_index=True)
        return out.astype({"p1": "int64", "p2": "int64", "cnt": "int64"})

    partials = salted_partition_apply(
        li.map_batches(batch_distinct, batch_format="pyarrow"),
        per_order, order_key, n_parts=n_parts)

    def pair_key(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            h = (t["p1"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 + t["p2"].to_numpy(zero_copy_only=False)
                 .astype(np.uint64))
        return h.view(np.int64)

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["p1", "p2"], as_index=False)["cnt"].sum()

    counts = salted_partition_apply(partials, sum_part, pair_key,
                                    n_parts=n_parts).materialize()

    def freq_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["p2"], pa.scalar(-1, pa.int64())))

    def pairs_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["p2"],
                                         pa.scalar(0, pa.int64())))

    _EMPTY = pa.table({"p1": pa.array([], pa.int64()),
                       "p2": pa.array([], pa.int64()),
                       "co_cnt": pa.array([], pa.int64()),
                       "union_cnt": pa.array([], pa.int64()),
                       "jaccard_ppm": pa.array([], pa.int64())})

    def finish(df: pd.DataFrame) -> pa.Table:
        """(p1, p2, cnt, n1, n2) block → annotated local top-k."""
        if df.empty:
            return _EMPTY
        co = df["cnt"].to_numpy(np.int64)
        union = (df["n1"].to_numpy(np.int64)
                 + df["n2"].to_numpy(np.int64) - co)
        out = pd.DataFrame({"p1": df["p1"].to_numpy(np.int64),
                            "p2": df["p2"].to_numpy(np.int64),
                            "co_cnt": co,
                            "union_cnt": union,
                            "jaccard_ppm": co * np.int64(1_000_000)
                            // union})
        out = out.sort_values(["co_cnt", "p1", "p2"],
                              ascending=[False, True, True],
                              kind="mergesort")
        return pa.Table.from_pandas(out.head(k), preserve_index=False)

    freq_ds = counts.map_batches(freq_only, batch_format="pyarrow") \
        .materialize()

    if freq_ds.count() <= freq_broadcast_rows:
        freq_df = freq_ds.to_pandas()
        keys = freq_df["p1"].to_numpy(np.int64)
        order = np.argsort(keys)
        nref = ray.put((keys[order],
                        freq_df["cnt"].to_numpy(np.int64)[order]))

        def topk_block(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            df = df[df["p2"] >= 0]
            if df.empty:
                return _EMPTY
            fk, fv = ray.get(nref)
            df = df.assign(
                n1=fv[np.searchsorted(fk, df["p1"].to_numpy(np.int64))],
                n2=fv[np.searchsorted(fk, df["p2"].to_numpy(np.int64))])
            return finish(df)

        top = counts.map_batches(topk_block, batch_format="pyarrow") \
            .to_pandas()
    else:
        # dimension table too big for one worker: ship the two
        # frequency lookups through hash_join exchanges instead
        from .join import hash_join

        pairs_ds = counts.map_batches(pairs_only,
                                      batch_format="pyarrow")
        f1 = freq_ds.map_batches(
            lambda t: pa.table({"p1": t["p1"], "n1": t["cnt"]}),
            batch_format="pyarrow")
        f2 = freq_ds.map_batches(
            lambda t: pa.table({"p2": t["p1"], "n2": t["cnt"]}),
            batch_format="pyarrow")
        j = hash_join(hash_join(pairs_ds, f1, on="p1",
                                n_parts=n_parts),
                      f2, on="p2", n_parts=n_parts)
        top = j.map_batches(
            lambda t: finish(t.to_pandas()),
            batch_format="pyarrow").to_pandas()
    top = top.sort_values(["co_cnt", "p1", "p2"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k)
    return top.reset_index(drop=True)


def interval_join_events(sf_dir: str, left_type: str = "error",
                         right_type: str = "click",
                         window_minutes: int = 30,
                         n_parts: int = 64):
    """Windowed stream-stream join (Flink-style interval join): ALL
    (left, right) event pairs of the same user with the right event in
    ``[left.ts, left.ts + window]`` — the many-match sibling of the
    as-of join (which keeps only the nearest). Returns a Dataset
    (user_id, error_id, click_id, delta_us).

    Scale shape: both sides ride ONE exchange keyed on the COMPOSITE
    (user_id, ts // window) — each left event emits into its own and
    the next time bucket (a right match r.ts ∈ [l.ts, l.ts+W] can only
    live in those two), rights emit once, so every true pair meets in
    exactly one bucket and a hot user's expansion is bounded by two
    windows of their events, not their whole history (advisor finding:
    the plain user key was O(L·R) per hot user). Delta is exact integer
    microseconds so the oracle compare is tie-free."""
    from .shuffle import salted_partition_apply

    ds = read(sf_dir, "events",
              ["event_id", "ts", "user_id", "event_type"])
    w_us = np.int64(window_minutes) * np.int64(60_000_000)

    def mark(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, pa.scalar(left_type)),
                      pc.equal(et, pa.scalar(right_type)))
        t = t.filter(keep)
        ts_us = t["ts"].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        is_left = pc.equal(t["event_type"], pa.scalar(left_type)) \
            .to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = ts_us // w_us
        # everyone in their own bucket; lefts AGAIN in the next bucket
        return pa.table({
            "event_id": pa.array(np.concatenate([eid, eid[is_left]])),
            "ts_us": pa.array(np.concatenate([ts_us, ts_us[is_left]])),
            "user_id": pa.array(np.concatenate([uid, uid[is_left]])),
            "bucket": pa.array(np.concatenate([b, b[is_left] + 1])),
            "is_left": pa.array(np.concatenate(
                [is_left, np.ones(int(is_left.sum()), bool)]))})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["is_left"]][["user_id", "bucket", "event_id", "ts_us"]]
        r = df[~df["is_left"]][["user_id", "bucket", "event_id", "ts_us"]]
        m = l.merge(r, on=["user_id", "bucket"], suffixes=("_e", "_c"))
        if m.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "error_id": pd.Series(dtype="int64"),
                                 "click_id": pd.Series(dtype="int64"),
                                 "delta_us": pd.Series(dtype="int64")})
        delta = (m["ts_us_c"].to_numpy(np.int64)
                 - m["ts_us_e"].to_numpy(np.int64))
        keep = (delta >= 0) & (delta <= w_us)
        m = m[keep]
        return pd.DataFrame({
            "user_id": m["user_id"].to_numpy(np.int64),
            "error_id": m["event_id_e"].to_numpy(np.int64),
            "click_id": m["event_id_c"].to_numpy(np.int64),
            "delta_us": delta[keep]})

    def key(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            return (t["user_id"].to_numpy(zero_copy_only=False)
                    .astype(np.int64) * np.int64(0x100000001B3)
                    + t["bucket"].to_numpy(zero_copy_only=False)
                    .astype(np.int64))

    return salted_partition_apply(
        ds.map_batches(mark, batch_format="pyarrow"), per_bucket,
        combine_key=key, n_parts=n_parts)


def tree_rollup(ds, key_col: str, weight_col: str, parent_of,
                root: int = 0, max_depth: int = 64, n_parts: int = 64):
    """Subtree aggregation over a bounded-depth tree with an
    ARITHMETIC/vectorized parent function (BOM explosions, org charts,
    URL path trees, the `parent = k // fanout` style of synthetic
    hierarchies): for every node, the total weight and node count of
    its subtree, self included.

    Scale shape — bounded-depth ancestor closure: each row emits its
    full ancestor chain (≤ depth rows, a small constant for real
    hierarchies) inside the batch map, and ONE exchange keyed on the
    ancestor sums everything where the ancestor lives. depth × |nodes|
    rows through one exchange beats depth sequential exchanges of a
    level-synchronous sweep whenever depth is a constant; a
    pointer-jumping log-depth form is the swap-in for unbounded depth.
    Raises if a chain exceeds ``max_depth`` (cycle guard). Returns a
    Dataset (key_col, subtree_sum, n_desc)."""
    from .shuffle import salted_partition_apply

    def explode(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cur = k.copy()
        alive = np.ones(k.size, dtype=bool)
        anc_parts, w_parts = [], []
        for _ in range(max_depth):
            if not alive.any():
                break
            anc_parts.append(cur[alive].copy())
            w_parts.append(w[alive])
            alive = alive & (cur != root)
            if alive.any():
                cur[alive] = parent_of(cur[alive])
        else:
            if alive.any():
                raise ValueError("tree_rollup: max_depth exceeded "
                                 "(cycle or unbounded chain)")
        if not anc_parts:
            return pa.table({key_col: pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({
            key_col: pa.array(np.concatenate(anc_parts), pa.int64()),
            "w": pa.array(np.concatenate(w_parts), pa.int64())})

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_col, as_index=False) \
            .agg(subtree_sum=("w", "sum"), n_desc=("w", "size"))
        g["n_desc"] = g["n_desc"].astype("int64")
        return g

    return salted_partition_apply(
        ds.map_batches(explode, batch_format="pyarrow"), reduce_part,
        combine_key=lambda t: t[key_col].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts)


def tree_rollup_pj(ds, key_col: str, weight_col: str, parent_of,
                   root: int = 0, n_parts: int = 16,
                   max_rounds: int = 64):
    """``tree_rollup`` for UNBOUNDED depth — pointer-jumping (the
    transpose of Wyllie's list-ranking doubling, log-depth rounds):
    per-node state (ptr = 2^i-th ancestor or null, dsum/dcnt = subtree
    mass within distance < 2^i) lives as a Dataset; each round ONE
    salted exchange groups carriers' mass by their pointer target,
    one node-scaled join folds it in (D_{i+1}(v) = D_i(v) +
    Σ_{p_i(u)=v} D_i(u) — every (descendant, ancestor) pair delivers
    exactly once via the binary decomposition of its distance), and
    one self-join doubles the pointers. ⌈log2 depth⌉+1 rounds where
    the closure form ships depth × |nodes| rows — the swap-in when
    depth is NOT a small constant (deep BOM chains, path hierarchies).

    Contract: every non-root node's parent key must itself be a row of
    ``ds`` (add weight-0 structural rows for pure interior nodes) —
    verified, raises ValueError on the first missing parent; the root
    row is synthesized with weight 0 when absent (the closure form
    reaches it arithmetically). Duplicate keys aggregate at init, the
    same semantics the closure's per-row emission yields. Cycles never
    null their pointers → the max_rounds raise. Returns a Dataset
    (key_col, subtree_sum, n_desc) — identical to ``tree_rollup``."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .join import hash_join
    from .shuffle import salted_partition_apply

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node"].to_numpy(zero_copy_only=False).astype(np.int64)

    def init_rows(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        is_root = k == root
        p = np.where(is_root, np.int64(0), parent_of(k)) \
            .astype(np.int64)
        ptr = pc.if_else(pa.array(is_root),
                         pa.scalar(None, pa.int64()),
                         pa.array(p, pa.int64()))
        return pa.table({
            "node": pa.array(k),
            "ptr": ptr,
            "dsum": pa.array(w),
            "dcnt": pa.array(np.ones(k.size, np.int64))})

    def init_agg(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False) \
            .agg(ptr=("ptr", "first"), dsum=("dsum", "sum"),
                 dcnt=("dcnt", "sum"))
        return g

    state = salted_partition_apply(
        ds.map_batches(init_rows, batch_format="pyarrow"),
        init_agg, node_key, n_parts=n_parts) \
        .repartition(n_parts).materialize()
    if state.count() == 0:
        return rd.from_pandas(pd.DataFrame(
            {key_col: pd.Series(dtype="int64"),
             "subtree_sum": pd.Series(dtype="int64"),
             "n_desc": pd.Series(dtype="int64")}))
    has_root = state.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.equal(t["node"], root),
                                pa.int64())).as_py() or 0)])}),
        batch_format="pyarrow").sum("n")
    if not has_root:
        state = state.union(rd.from_pandas(pd.DataFrame(
            {"node": pd.Series([root], dtype="int64"),
             "ptr": pd.Series([pd.NA], dtype="Int64"),
             "dsum": pd.Series([0], dtype="int64"),
             "dcnt": pd.Series([0], dtype="int64")}))) \
            .repartition(n_parts).materialize()

    def live_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["ptr"]))

    # parent-presence check, once: all round-0 pointers must be state
    # nodes (higher rounds follow by induction — jumps resolve through
    # state joins)
    ptr_keys = state.map_batches(
        lambda t: pa.table({"node": pc.cast(
            live_only(t)["ptr"], pa.int64())}),
        batch_format="pyarrow")
    orphans = hash_join(ptr_keys,
                        state.map_batches(
                            lambda t: t.select(["node"]),
                            batch_format="pyarrow"),
                        on="node", how="anti",
                        n_parts=n_parts).materialize()
    if orphans.count():
        bad = orphans.limit(5).to_pandas()["node"].tolist()
        raise ValueError(
            f"tree_rollup_pj: parent keys missing from ds "
            f"(first few: {bad}) — add weight-0 structural rows")

    for _round in range(max_rounds):
        live = state.map_batches(live_only, batch_format="pyarrow") \
            .materialize()
        if live.count() == 0:
            break

        # carrier mass grouped by pointer target (pre-update D_i, p_i)
        def carry_partial(t: pa.Table) -> pa.Table:
            return pa.table({
                "node": pc.cast(t["ptr"], pa.int64()),
                "gsum": t["dsum"], "gcnt": t["dcnt"]})

        g = salted_partition_apply(
            live.map_batches(carry_partial, batch_format="pyarrow"),
            lambda df: df.groupby("node", as_index=False)[
                ["gsum", "gcnt"]].sum(),
            node_key, n_parts=n_parts)

        # pointer doubling: p'(u) = p_i(p_i(u)) via a self-join
        jmp = hash_join(
            live.map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "jkey": pc.cast(t["ptr"], pa.int64())}),
                batch_format="pyarrow"),
            state.map_batches(
                lambda t: pa.table({"jkey": t["node"],
                                    "ptr2": t["ptr"]}),
                batch_format="pyarrow"),
            on="jkey", how="left", n_parts=n_parts) \
            .map_batches(lambda t: t.select(["node", "ptr2"]),
                         batch_format="pyarrow")

        merged = hash_join(state, g, on="node", how="left",
                           n_parts=n_parts)
        merged = hash_join(
            merged,
            jmp.map_batches(
                lambda t: pa.table({"node": t["node"],
                                    "new_ptr": t["ptr2"]}),
                batch_format="pyarrow"),
            on="node", how="left", n_parts=n_parts)

        def apply_all(t: pa.Table) -> pa.Table:
            # nodes absent from jmp (already-done pointers) keep null;
            # live nodes take the doubled pointer (itself may be null)
            new_ptr = t["new_ptr"]
            return pa.table({
                "node": t["node"],
                "ptr": new_ptr,
                "dsum": pc.add(t["dsum"], pc.fill_null(t["gsum"], 0)),
                "dcnt": pc.add(t["dcnt"], pc.fill_null(t["gcnt"], 0))})

        state = merged.map_batches(apply_all, batch_format="pyarrow") \
            .repartition(n_parts).materialize()
    else:
        raise RuntimeError(
            f"tree_rollup_pj: pointers still live after {max_rounds} "
            "rounds — cycle, or depth beyond 2^max_rounds")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({key_col: t["node"],
                         "subtree_sum": t["dsum"],
                         "n_desc": t["dcnt"]})

    return state.map_batches(finish, batch_format="pyarrow")
