"""Link-graph analytics: distributed PageRank power iteration.

Crawl context: PageRank over the host/outlink graph is the classic
frontier-prioritization signal (the reference's `valid_url` policy,
urls.py:106-241, gates WHICH links enter the frontier; a link-graph
score decides WHICH to fetch first — SURVEY.md §2.6 O6). The engine's
crawl harvests the (src_host, dst_host) edges anyway; this module turns
them into scores with the same algebra at any scale.

Scale shape: each iteration is one streamed pass over the edge Dataset
(`map_batches` computing per-batch PARTIAL contribution sums via
bincount) followed by one node-scaled `groupby(node).Sum` — the edges
never leave the object store, nothing edge-scaled touches the driver.
The rank/degree vectors are broadcast once per iteration via `ray.put`
(node-scaled, the small side by graph-theory: |V| ≪ |E|). If the node
table itself outgrew worker heap (10^9+ hosts), the identical algebra
runs as a `hash_join(edges, ranks, on=src)` exchange per iteration —
the broadcast is a size-triggered optimization, not a structural
assumption.

The oracle in `__ray_entry__.oracle_sql_all()["trade_pagerank_undirected"]` re-derives
the same fixed-iteration scores with chained SQL CTEs (one join+groupby
per iteration), so every float is checked against an independent
implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges_ds, damping: float = 0.85, iters: int = 3,
             node_broadcast_limit: int = 50_000_000,
             personalize: "list[int] | None" = None,
             weight_col: str | None = None):
    """Fixed-iteration PageRank over a directed edge Dataset
    (src:int64, dst:int64), with full dangling-node (sink) handling:
    the node universe is src ∪ dst, sinks carry out-degree 0, and their
    rank mass is redistributed uniformly each iteration (the standard
    PageRank dangling term) — so a general crawl host graph with sink
    pages is scored correctly, not crashed on or silently mis-credited.
    Returns pandas (node_id, score) sorted by node_id — node-scaled,
    the quantity any consumer holds.

    Two execution paths behind a node-count switch (the adaptive_join
    pattern): up to ``node_broadcast_limit`` nodes, the rank/degree
    vectors are broadcast per iteration (fast path — host graphs have
    |V| ≪ |E|); above it, NOTHING node-scaled touches the driver —
    ranks and degrees live as Datasets and each iteration runs as
    hash_join exchanges + a salted dst-sum (``_pagerank_distributed``).
    Both paths share the node-discovery exchange and the same float64
    algebra (equal to summation-order noise; consumers round).

    ``personalize``: seed node ids for PERSONALIZED PageRank — the
    teleport vector (and the dangling-mass sink) concentrates on the
    seeds present in the graph, 1/|S| each, instead of uniform 1/n;
    initial ranks likewise. The seed set is small by definition (it is
    user input), so it broadcasts into both paths' closures; seeds
    absent from the edge set are ignored, an all-absent set raises.

    ``weight_col``: optional per-edge positive weight — rank mass
    leaves a node proportionally to w(e)/Σ_out w (out-STRENGTH, the
    anchor-count-weighted host-rank form); None reproduces the
    uniform 1/deg algebra bit-for-bit (bincount of ones). A node
    whose out-weights sum to 0 is a sink, same as no out-edges."""
    import ray
    from ray.data.aggregate import Count, Sum

    if weight_col in ("src", "dst", "node", "rank", "deg", "w",
                      "sink_rank", "c"):
        raise ValueError(f"weight_col collides with an internal "
                         f"column: {weight_col!r}")

    # materialize once (iterated `iters` times) and right-size blocks:
    # the salted exchange that built the edges leaves ~64 sub-MB blocks,
    # and every extra block is one more task per iteration
    edges_ds = edges_ds.repartition(16).materialize()

    # node discovery + the |V| switch, scale-safely — the shared
    # _node_universe_switch helper (one copy with the k-core/SCC
    # paths; review finding: this function carried its own inline
    # twin, and the two had already drifted in shape)
    if edges_ds.count() == 0:
        return pd.DataFrame({"node_id": pd.Series(dtype="int64"),
                             "score": pd.Series(dtype="float64")})
    nodes, nodes_ds, n = _node_universe_switch(edges_ds,
                                               node_broadcast_limit)

    if n > node_broadcast_limit:
        # rename via an Arrow map (Dataset.rename_columns chokes on the
        # pandas blocks a groupby emits in ray 2.49). The groupby degree
        # form exists ONLY on this path — the broadcast path below gets
        # degrees from a streamed bincount pass instead (one sort
        # exchange + materialize cheaper; measured ~1 s at sf0.1)
        agg = (Sum(weight_col, alias_name="deg") if weight_col
               else Count(alias_name="deg"))
        deg_ds = edges_ds.groupby("src") \
            .aggregate(agg) \
            .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                         batch_format="pyarrow").materialize()
        return _pagerank_distributed(edges_ds, n, nodes_ds, deg_ds,
                                     damping, iters,
                                     personalize=personalize,
                                     weight_col=weight_col)
    # out-degrees via the same broadcast-partials shape as contrib: one
    # streamed pass, per-batch bincount into the node order, driver sum
    nref = ray.put(nodes)

    def deg_partial(t: pa.Table) -> pa.Table:
        nd = ray.get(nref)
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        wv = (t[weight_col].to_numpy(zero_copy_only=False)
              .astype(np.float64) if weight_col else None)
        sums = np.bincount(np.searchsorted(nd, src), weights=wv,
                           minlength=len(nd))
        hit = np.nonzero(sums)[0]
        return pa.table({"idx": pa.array(hit.astype(np.int64)),
                         "partial": pa.array(sums[hit].astype(np.float64),
                                             pa.float64())})

    deg_df = edges_ds.map_batches(deg_partial, batch_format="pyarrow") \
        .to_pandas()
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, deg_df["idx"].to_numpy(), deg_df["partial"].to_numpy())
    sinks = deg == 0.0
    safe_deg = np.where(sinks, 1.0, deg)
    if personalize is not None:
        seeds_in = np.intersect1d(
            nodes, np.unique(np.asarray(personalize, dtype=np.int64)))
        if seeds_in.size == 0:
            raise ValueError("no personalization seed exists in the graph")
        p = np.zeros(n, dtype=np.float64)
        p[np.searchsorted(nodes, seeds_in)] = 1.0 / seeds_in.size
        ranks = p.copy()
    else:
        p = None
        ranks = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n

    for _ in range(iters):
        over_deg = np.where(sinks, 0.0, ranks / safe_deg)
        dangling = float(ranks[sinks].sum())
        ref = ray.put((nodes, over_deg))

        def contrib(t: pa.Table) -> pa.Table:
            # per-batch PARTIAL contribution sums, indexed into the
            # broadcast node order — each batch returns ≤ |V| rows
            nd, od = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            w = od[np.searchsorted(nd, src)]
            if weight_col:
                w = w * t[weight_col].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
            di = np.searchsorted(nd, dst)
            sums = np.bincount(di, weights=w, minlength=len(nd))
            hit = np.nonzero(sums)[0]
            return pa.table({
                "idx": pa.array(hit.astype(np.int64)),
                "partial": pa.array(sums[hit], pa.float64())})

        # final reduce on the driver: the rank vector is driver-resident
        # by construction in this (broadcast) form, so summing the
        # block partials there adds no new scale assumption — and skips
        # a Ray groupby whose per-distinct-group reduce cost 5s/iter on
        # 16k nodes (measured; the bincount form is ~20x faster). The
        # web-scale form (ranks as a Dataset + hash_join per iteration,
        # module docstring) replaces BOTH the broadcast and this reduce.
        parts = edges_ds.map_batches(contrib, batch_format="pyarrow") \
            .to_pandas()
        if p is None:
            new = np.full(n, base + damping * dangling / n)
        else:
            # teleport AND dangling mass both land on the seed vector
            new = ((1.0 - damping) + damping * dangling) * p
        np.add.at(new, parts["idx"].to_numpy(),
                  damping * parts["partial"].to_numpy())
        ranks = new

    return pd.DataFrame({"node_id": nodes, "score": ranks})


def _pagerank_distributed(edges_ds, n: int, nodes_ds, deg_ds,
                          damping: float, iters: int,
                          personalize: "list[int] | None" = None,
                          weight_col: str | None = None
                          ) -> pd.DataFrame:
    """Web-scale PageRank path: ranks/degrees stay as Datasets; per
    iteration the driver sees only two scalars (dangling mass via
    ``sum``, plus lineage handles). Each iteration = hash_join(ranks,
    deg) -> per-node weight, hash_join(edges, weights on src) ->
    per-batch partial dst-sums -> one salted exchange, hash_join(nodes,
    contrib, how='left') -> new ranks. Same float64 algebra as the
    broadcast path (bit-equal up to summation order; consumers round).
    The returned frame is node-scaled — the quantity any consumer of
    PageRank holds by definition; callers at 10^9 nodes should instead
    consume ``ranks_ds`` via write_parquet (see trade_pagerank for the
    small-result form)."""
    from .join import hash_join
    from .shuffle import salted_partition_apply

    base = (1.0 - damping) / n
    init = 1.0 / n
    seed_arr = None
    if personalize is not None:
        # seeds ∩ node universe, discovered WITHOUT pulling the
        # universe: filter the node Dataset by the (tiny, broadcast)
        # seed list and collect ≤ |seeds| rows
        import pyarrow.compute as pc

        cand = np.unique(np.asarray(personalize, dtype=np.int64))
        hits = nodes_ds.map_batches(
            lambda t, _c=cand: t.filter(
                pc.is_in(t["node"], pa.array(_c, pa.int64()))),
            batch_format="pyarrow").to_pandas()
        seed_arr = np.unique(hits["node"].to_numpy().astype(np.int64))
        if seed_arr.size == 0:
            raise ValueError("no personalization seed exists in the graph")
        p_seed = 1.0 / seed_arr.size

    def init_rank(t: pa.Table) -> pa.Table:
        if seed_arr is None:
            r = np.full(len(t), init)
        else:
            node = t["node"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            r = np.where(np.isin(node, seed_arr), p_seed, 0.0)
        return pa.table({"node": t["node"], "rank": pa.array(
            r, pa.float64())})

    ranks_ds = nodes_ds.map_batches(init_rank, batch_format="pyarrow") \
        .materialize()

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node"].to_numpy(zero_copy_only=False).astype(np.int64)

    for _ in range(iters):
        rd = hash_join(ranks_ds, deg_ds, on="node", how="left",
                       n_parts=16)

        def weights(t: pa.Table) -> pa.Table:
            rank = t["rank"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            deg = t["deg"].to_pandas().to_numpy(dtype=np.float64,
                                                na_value=np.nan)
            sink = ~(deg > 0)            # null or 0 out-degree
            w = np.where(sink, 0.0, rank / np.where(sink, 1.0, deg))
            return pa.table({
                "src": t["node"],
                "w": pa.array(w, pa.float64()),
                "sink_rank": pa.array(np.where(sink, rank, 0.0),
                                      pa.float64())})

        rw = rd.map_batches(weights, batch_format="pyarrow").materialize()
        dangling = float(rw.sum("sink_rank") or 0.0)
        per_edge = hash_join(edges_ds,
                             rw.select_columns(["src", "w"]),
                             on="src", how="inner", n_parts=16)

        def partial_dst(t: pa.Table) -> pa.Table:
            c = t["w"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            if weight_col:
                c = c * t[weight_col].to_numpy(zero_copy_only=False) \
                    .astype(np.float64)
            df = pd.DataFrame({
                "node": t["dst"].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "c": c})
            g = df.groupby("node", sort=True, as_index=False)["c"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        contrib = salted_partition_apply(
            per_edge.map_batches(partial_dst, batch_format="pyarrow"),
            lambda df: df.groupby("node", sort=True,
                                  as_index=False)["c"].sum(),
            combine_key=node_key, n_parts=16)
        joined = hash_join(nodes_ds, contrib, on="node", how="left",
                           n_parts=16)
        add = base + damping * dangling / n
        seed_add = (None if seed_arr is None
                    else ((1.0 - damping) + damping * dangling) * p_seed)

        def new_rank(t: pa.Table, _sa=seed_add) -> pa.Table:
            c = t["c"].to_pandas().to_numpy(dtype=np.float64,
                                            na_value=0.0)
            if seed_arr is None:
                r = add + damping * c
            else:
                node = t["node"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                r = np.where(np.isin(node, seed_arr), _sa, 0.0) \
                    + damping * c
            return pa.table({"node": t["node"], "rank": pa.array(
                r, pa.float64())})

        ranks_ds = joined.map_batches(new_rank, batch_format="pyarrow") \
            .materialize()

    out = ranks_ds.to_pandas().sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node_id": out["node"].astype("int64"),
                         "score": out["rank"].astype(np.float64)})


def _trade_pair_edges(sf_dir: str, edge_rows, *,
                      with_quantity: bool = False, n_parts: int = 64,
                      reduce_fn=None):
    """Shared base of every trade-graph derivation (plain / cyclic /
    sparse — previously three private copies of the same scaffold,
    review finding): lineitem ⋈ orders through the runtime
    broadcast-vs-exchange switch, ``edge_rows(batch) -> (src, dst)``
    chooses the emission (predicates, direction, node encoding), then
    ONE pair-keyed salted exchange reduces to distinct edges.
    ``with_quantity`` prunes the read to the columns the emission
    actually needs."""
    from .analytics import read
    from .join import adaptive_join
    from .shuffle import salted_partition_apply

    cols = ["l_orderkey", "l_suppkey"] + (
        ["l_quantity"] if with_quantity else [])
    li = read(sf_dir, "lineitem", cols)
    orders = read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = adaptive_join(li, orders, on="l_orderkey",
                           right_on="o_orderkey")

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["src", "dst"])

    def pair_key(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            k = (t["src"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + t["dst"].to_numpy().astype(np.uint64))
        return k.view(np.int64)

    return salted_partition_apply(
        joined.map_batches(edge_rows, batch_format="pyarrow"),
        reduce_fn or distinct_pairs, pair_key, n_parts=n_parts)


def _bidir(t: pa.Table) -> pa.Table:
    """Symmetrize distinct (src, dst) rows — both directions out."""
    s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "src": pa.array(np.concatenate([s, d]), pa.int64()),
        "dst": pa.array(np.concatenate([d, s]), pa.int64())})


def trade_edges(sf_dir: str):
    """Bidirectional customer↔supplier trade graph from lineitem ⋈
    orders: one edge pair per DISTINCT (custkey, suppkey) that ever
    traded. Node ids disambiguate the two families (cust·2, supp·2+1)."""

    def pair_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(c * 2, pa.int64()),
                         "dst": pa.array(s * 2 + 1, pa.int64())})

    return _trade_pair_edges(sf_dir, pair_rows) \
        .map_batches(_bidir, batch_format="pyarrow")


def trade_edges_weighted(sf_dir: str):
    """Bidirectional trade graph with per-edge WEIGHT = the number of
    lineitem rows between the pair (trade intensity); same node
    encoding, one pair-keyed count exchange instead of the distinct."""

    def pair_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(c * 2, pa.int64()),
                         "dst": pa.array(s * 2 + 1, pa.int64())})

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["src", "dst"], as_index=False).size()
        return g.rename(columns={"size": "wt"})

    def bidir_w(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["wt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([s, d]), pa.int64()),
            "dst": pa.array(np.concatenate([d, s]), pa.int64()),
            "wt": pa.array(np.concatenate([w, w]), pa.int64())})

    return _trade_pair_edges(sf_dir, pair_rows,
                             reduce_fn=count_pairs) \
        .map_batches(bidir_w, batch_format="pyarrow")


def trade_pagerank_weighted(sf_dir: str, damping: float = 0.85,
                            iters: int = 3) -> pd.DataFrame:
    """PageRank over the WEIGHTED bidirectional trade graph — rank
    mass flows proportionally to trade intensity (w/Σ_out w), the
    anchor-count-weighted host-rank algebra; chained weighted-CTE
    oracle."""
    return pagerank(trade_edges_weighted(sf_dir), damping=damping,
                    iters=iters, weight_col="wt")


def trade_pagerank(sf_dir: str, damping: float = 0.85, iters: int = 3):
    """PageRank scores over the trade graph; floats rounded to 6 for
    oracle hash-stability (summation-order noise is ~1e-16)."""
    df = pagerank(trade_edges(sf_dir), damping=damping, iters=iters)
    df["score"] = df["score"].round(6)
    return df.sort_values("node_id").reset_index(drop=True)


def trade_edges_directed(sf_dir: str):
    """ONE-WAY customer→supplier edges (no reverse direction): every
    supplier node is a pure sink, exercising the dangling-mass term of
    ``pagerank`` under the SQL oracle."""
    ds = trade_edges(sf_dir)

    def forward_only(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        keep = src % 2 == 0          # customer ids are even by encoding
        return pa.table({"src": pa.array(src[keep], pa.int64()),
                         "dst": pa.array(dst[keep], pa.int64())})

    return ds.map_batches(forward_only, batch_format="pyarrow")


def trade_pagerank_directed(sf_dir: str, damping: float = 0.85,
                            iters: int = 3):
    """PageRank over the one-way trade graph: all supplier nodes are
    sinks, so scores depend on correct uniform redistribution of
    dangling mass every iteration — oracle-checked against a chained-CTE
    SQL form that computes the same dangling term explicitly."""
    df = pagerank(trade_edges_directed(sf_dir), damping=damping,
                  iters=iters)
    df["score"] = df["score"].round(6)
    return df.sort_values("node_id").reset_index(drop=True)


def hits(edges_ds, iters: int = 3,
         node_broadcast_limit: int = 50_000_000) -> pd.DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over a
    directed edge Dataset (src:int64, dst:int64): per iteration
    ``auth = normalize(AᵀH)`` then ``hub = normalize(A·auth)`` with L2
    norms, init hub = 1 on the full node universe (src ∪ dst). Returns
    pandas (node_id, authority, hub) sorted by node_id — node-scaled.

    Same two-path shape as ``pagerank`` behind the same node-count
    switch: below ``node_broadcast_limit`` the score vectors broadcast
    per pass (each half-iteration is ONE streamed edge pass emitting
    per-batch bincount partials); above it nothing node-scaled touches
    the driver — scores stay Datasets and each half-iteration is a
    hash_join on the edge endpoint + a salted contribution sum, with
    the L2 norm reduced as a Dataset scalar (``sum`` of squares). Both
    paths share the discovery exchange and float64 algebra (equal up to
    summation order; consumers round). Oracle: chained-CTE SQL in
    __ray_entry__ (one join+groupby+norm per half-iteration)."""
    import ray

    from .shuffle import salted_partition_apply

    edges_ds = edges_ds.repartition(16).materialize()
    n_edges = edges_ds.count()
    empty = pd.DataFrame({"node_id": pd.Series(dtype="int64"),
                          "authority": pd.Series(dtype="float64"),
                          "hub": pd.Series(dtype="float64")})
    if n_edges == 0:
        return empty

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    # node discovery mirrors pagerank: driver-side concat of per-batch
    # uniques while the 2|E| bound fits, else a distinct exchange
    if 2 * n_edges <= node_broadcast_limit:
        node_parts = edges_ds.map_batches(uniq, batch_format="pyarrow") \
            .to_pandas()
        nodes = np.unique(node_parts["node"].to_numpy().astype(np.int64))
        if len(nodes) > node_broadcast_limit:
            return _hits_distributed(edges_ds, nodes, iters)
        return _hits_broadcast(edges_ds, nodes, iters)
    nodes_ds = salted_partition_apply(
        edges_ds.map_batches(uniq, batch_format="pyarrow"),
        lambda df: df.drop_duplicates("node"),
        combine_key=lambda t: t["node"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=16).materialize()
    n = nodes_ds.count()
    if n > node_broadcast_limit:
        return _hits_distributed(edges_ds, nodes_ds, iters)
    nodes = np.sort(nodes_ds.to_pandas()["node"].to_numpy()
                    .astype(np.int64))
    return _hits_broadcast(edges_ds, nodes, iters)


def _hits_broadcast(edges_ds, nodes: np.ndarray, iters: int) \
        -> pd.DataFrame:
    """Broadcast HITS: one streamed edge pass per half-iteration, each
    batch returning ≤ |V| bincount-partial rows; driver holds only the
    two node vectors (which this path exists for: |V| fits)."""
    import ray

    n = len(nodes)

    def edge_pass(weight_on: str, sum_into: str, vec: np.ndarray) \
            -> np.ndarray:
        ref = ray.put((nodes, vec))

        def contrib(t: pa.Table) -> pa.Table:
            nd, v = ray.get(ref)
            w_idx = np.searchsorted(nd, t[weight_on].to_numpy(
                zero_copy_only=False).astype(np.int64))
            s_idx = np.searchsorted(nd, t[sum_into].to_numpy(
                zero_copy_only=False).astype(np.int64))
            sums = np.bincount(s_idx, weights=v[w_idx], minlength=len(nd))
            hit = np.nonzero(sums)[0]
            return pa.table({"idx": pa.array(hit.astype(np.int64)),
                             "partial": pa.array(sums[hit], pa.float64())})

        parts = edges_ds.map_batches(contrib, batch_format="pyarrow") \
            .to_pandas()
        out = np.zeros(n, dtype=np.float64)
        np.add.at(out, parts["idx"].to_numpy(),
                  parts["partial"].to_numpy())
        return out

    hub = np.ones(n, dtype=np.float64)
    auth = np.zeros(n, dtype=np.float64)
    for _ in range(iters):
        auth = edge_pass("src", "dst", hub)
        z = np.sqrt(float(auth @ auth))
        auth = auth / z if z > 0 else auth
        hub = edge_pass("dst", "src", auth)
        z = np.sqrt(float(hub @ hub))
        hub = hub / z if z > 0 else hub
    return pd.DataFrame({"node_id": nodes, "authority": auth,
                         "hub": hub})


def _hits_distributed(edges_ds, nodes, iters: int) -> pd.DataFrame:
    """Web-scale HITS path: score vectors stay Datasets; per
    half-iteration the driver sees one scalar (the squared-norm sum).
    Each half = hash_join(edges, scores on the weight endpoint) →
    per-batch partial sums on the other endpoint → salted exchange →
    left-join onto the node table → normalize by the Dataset-reduced
    L2 norm. ``nodes`` may arrive as a np.ndarray (small-discovery
    case hitting the |V| switch) or a Dataset."""
    import ray.data as rd

    from .join import hash_join
    from .shuffle import salted_partition_apply

    if isinstance(nodes, np.ndarray):
        nodes_ds = rd.from_arrow(
            pa.table({"node": pa.array(nodes, pa.int64())})) \
            .repartition(16).materialize()
    else:
        nodes_ds = nodes

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node"].to_numpy(zero_copy_only=False).astype(np.int64)

    def const_scores(val: float):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "score": pa.array(
                np.full(len(t), val), pa.float64())})
        return fn

    hub_ds = nodes_ds.map_batches(const_scores(1.0),
                                  batch_format="pyarrow").materialize()

    def half(score_ds, weight_on: str, sum_into: str):
        per_edge = hash_join(
            edges_ds, score_ds.map_batches(
                lambda t, c=weight_on: t.rename_columns([c, "w"]),
                batch_format="pyarrow"),
            on=weight_on, how="inner", n_parts=16)

        def partial(t: pa.Table, c=sum_into) -> pa.Table:
            df = pd.DataFrame({
                "node": t[c].to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "s": t["w"].to_numpy(zero_copy_only=False)
                .astype(np.float64)})
            g = df.groupby("node", sort=True, as_index=False)["s"].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        contrib = salted_partition_apply(
            per_edge.map_batches(partial, batch_format="pyarrow"),
            lambda df: df.groupby("node", sort=True,
                                  as_index=False)["s"].sum(),
            combine_key=node_key, n_parts=16)
        joined = hash_join(nodes_ds, contrib, on="node", how="left",
                           n_parts=16)

        def raw(t: pa.Table) -> pa.Table:
            s = t["s"].to_pandas().to_numpy(dtype=np.float64,
                                            na_value=0.0)
            return pa.table({"node": t["node"],
                             "score": pa.array(s, pa.float64()),
                             "sq": pa.array(s * s, pa.float64())})

        raw_ds = joined.map_batches(raw, batch_format="pyarrow") \
            .materialize()
        z = np.sqrt(float(raw_ds.sum("sq") or 0.0))
        inv = 1.0 / z if z > 0 else 1.0

        def norm(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["node"], "score": pa.array(
                t["score"].to_numpy(zero_copy_only=False) * inv,
                pa.float64())})

        return raw_ds.map_batches(norm, batch_format="pyarrow") \
            .materialize()

    auth_ds = None
    for _ in range(iters):
        auth_ds = half(hub_ds, "src", "dst")
        hub_ds = half(auth_ds, "dst", "src")

    a = auth_ds.to_pandas().rename(columns={"score": "authority"})
    h = hub_ds.to_pandas().rename(columns={"score": "hub"})
    out = a.merge(h, on="node").sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node_id": out["node"].astype("int64"),
                         "authority": out["authority"].astype(np.float64),
                         "hub": out["hub"].astype(np.float64)})


def trade_hits(sf_dir: str, iters: int = 3) -> pd.DataFrame:
    """HITS over the one-way customer→supplier trade graph: customers
    are pure hubs (no in-edges), suppliers pure authorities — the
    bipartite case where HITS degenerates to iterated co-citation
    weighting, fully oracle-checkable. Floats rounded to 6dp for
    hash-stability."""
    df = hits(trade_edges_directed(sf_dir), iters=iters)
    df["authority"] = df["authority"].round(6)
    df["hub"] = df["hub"].round(6)
    return df.sort_values("node_id").reset_index(drop=True)


def connected_components(edges_ds, n_parts: int = 32,
                         max_rounds: int = 30) -> pd.DataFrame:
    """Public connected-components operator over a directed-or-symmetric
    (src:int64, dst:int64) edge Dataset: returns (node_id, component_id)
    with component_id = the component's minimum node id, one row per
    node that appears in any edge.

    Engine: the alternating large-star/small-star edge rewriting the
    minhash dedup-group resolver runs (Kiveris et al. SoCC'14 — see
    dedup.resolve_duplicate_groups_distributed); the graph stays an edge
    Dataset end to end, O(log n) salted exchanges, loud failure on
    non-convergence. This wrapper is the crawl-scale entry point (host
    clusters over the outlink graph); the SQL oracle re-derives the same
    labels with a recursive reachability closure."""
    def to_pairs(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["src"], "b": t["dst"]})

    from .dedup import resolve_duplicate_groups_distributed

    out = resolve_duplicate_groups_distributed(
        edges_ds.map_batches(to_pairs, batch_format="pyarrow"),
        max_rounds=max_rounds, n_parts=n_parts)
    return out.rename(columns={"doc_id": "node_id",
                               "keep_doc_id": "component_id"})


def trade_components(sf_dir: str) -> pd.DataFrame:
    """Connected components of the bidirectional customer↔supplier trade
    graph (same edge derivation as trade_pagerank)."""
    return connected_components(trade_edges(sf_dir))


def bfs_hops(edges_ds, sources: list[int], max_hops: int = 4,
             n_parts: int = 32) -> pd.DataFrame:
    """Multi-source BFS hop distances over a (src:int64, dst:int64)
    edge Dataset: (node_id, dist) for every node within ``max_hops`` of
    any source, dist = the MINIMUM hop count (sources at 0). The
    frontier-priority primitive behind crawl-depth accounting and
    seed-distance features.

    Scale shape: the frontier and the visited set stay DATASETS end to
    end — per hop, ONE semi-join keeps the edges leaving the frontier
    (edges exchange on src), a salted distinct collapses their dst
    multiplicity, and an anti-join against visited shrinks the next
    frontier; the graph never concentrates on the driver (only per-hop
    row COUNTS cross, for termination). max_hops × 3 key-functional
    exchanges total — the same per-iteration shape as the distributed
    PageRank path, with the visited anti-join keeping re-expansion off
    the table on high-diameter graphs."""
    import ray.data as rd

    from .join import hash_join
    from .shuffle import salted_partition_apply

    src_ids = np.unique(np.asarray(sources, dtype=np.int64))
    if src_ids.size == 0:
        raise ValueError("bfs_hops needs at least one source node")
    visited = rd.from_pandas(pd.DataFrame({"node_id": src_ids}))
    frontier = rd.from_pandas(pd.DataFrame({"src": src_ids}))
    levels = [pd.DataFrame({"node_id": src_ids,
                            "dist": np.zeros(src_ids.size, np.int64)})]

    def dst_only(t: pa.Table) -> pa.Table:
        return pa.table({"node_id": t["dst"]})

    def as_src(t: pa.Table) -> pa.Table:
        # avoids Dataset.rename_columns, whose Project stage rejects
        # the pandas blocks the exchange emits (Ray 2.49)
        return pa.table({"src": t["node_id"]})

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    for h in range(1, max_hops + 1):
        out_edges = hash_join(edges_ds, frontier, on="src",
                              how="semi", n_parts=n_parts)
        cand = salted_partition_apply(
            out_edges.map_batches(dst_only, batch_format="pyarrow"),
            lambda df: df.drop_duplicates("node_id"),
            node_key, n_parts=n_parts)
        nxt = hash_join(cand, visited, on="node_id", how="anti",
                        n_parts=n_parts).materialize()
        n_new = nxt.count()
        if n_new == 0:
            break
        levels.append(pd.DataFrame({
            "node_id": nxt.to_pandas()["node_id"].astype("int64"),
            "dist": np.full(n_new, h, np.int64)}))
        visited = visited.union(nxt).materialize()
        frontier = nxt.map_batches(as_src, batch_format="pyarrow")

    out = pd.concat(levels, ignore_index=True)
    return out.sort_values("node_id").reset_index(drop=True)


def trade_bfs(sf_dir: str, max_hops: int = 3) -> pd.DataFrame:
    """BFS hop distances over the bidirectional trade graph from the
    two smallest node ids (deterministic seed pick, shared with the
    recursive-CTE oracle). NOTE: levels collect to pandas on the
    driver — O(nodes-within-range) rows, the same driver volume as the
    result itself."""
    edges = trade_edges(sf_dir).materialize()

    def min2(t: pa.Table) -> pa.Table:
        s = np.unique(t["src"].to_numpy(zero_copy_only=False))[:2]
        return pa.table({"node_id": pa.array(s, pa.int64())})

    partials = edges.map_batches(min2, batch_format="pyarrow") \
        .to_pandas()["node_id"].to_numpy()
    seeds = np.unique(partials)[:2].tolist()
    return bfs_hops(edges, seeds, max_hops=max_hops)


def _node_universe_switch(edges_ds, node_broadcast_limit: int,
                          n_parts: int = 16):
    """Scale-safe node discovery + |V| switch shared by the two-path
    graph operators (the pagerank lines 84-101 idiom, now one copy):
    ``edges_ds`` must be materialized. When even the 2|E| bound fits
    the broadcast limit, per-batch uniques concatenate on the driver
    directly (bounded by the same limit; skips one salted exchange).
    Only when the BOUND overflows does the distinct run as a
    distributed exchange — and then the driver sees nothing
    node-scaled before the path is chosen. Returns
    ``(nodes, nodes_ds, n)``: exactly one of nodes (sorted ndarray) /
    nodes_ds (distinct-node Dataset) is non-None; nodes_ds non-None
    means the caller must take its Dataset-resident path."""
    from .shuffle import salted_partition_apply

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    n_edges = edges_ds.count()
    if 2 * n_edges <= node_broadcast_limit:
        parts = edges_ds.map_batches(uniq, batch_format="pyarrow") \
            .to_pandas()
        nodes = np.unique(parts["node"].to_numpy().astype(np.int64))
        return nodes, None, len(nodes)
    nodes_ds = salted_partition_apply(
        edges_ds.map_batches(uniq, batch_format="pyarrow"),
        lambda df: df.drop_duplicates("node"),
        combine_key=lambda t: t["node"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts).materialize()
    n = nodes_ds.count()
    if n <= node_broadcast_limit:    # discovered distributed, but fits
        nodes = np.sort(nodes_ds.to_pandas()["node"].to_numpy()
                        .astype(np.int64))
        return nodes, None, n
    return None, nodes_ds, n


def _compact(ds, k: int = 8):
    """Re-materialize loop-carried state with a BOUNDED block count.
    Fixpoint loops (k-core peel, SCC trim/color/backward) otherwise
    accumulate blocks wave over wave — union and hash_join outputs sum
    their inputs' block counts, and per-execution scheduling cost grows
    with block count, not bytes (measured: the 9-edge SCC hand graph
    livelocked past 15 min before this, 3 min after). One repartition
    per wave of node-scaled state is noise next to the exchanges the
    wave already runs."""
    return ds.repartition(k).materialize()


def _drop_edges_touching(live_ds, dead_ds, n_dead: int,
                         n_parts: int = 16,
                         broadcast_limit_bytes: int = 256 << 20):
    """Remove every edge with either endpoint in ``dead_ds`` (a
    (node:int64) Dataset of ``n_dead`` rows) from a (src, dst) edge
    Dataset — the per-wave subgraph shrink of the Dataset-resident
    k-core / SCC paths. Byte-probed two-path form (the engine's
    standard small-side switch): a wave's peel set is usually tiny, so
    the sorted-membership broadcast filter wins; a degenerate wave
    (star-graph leaf kill) can be node-scaled, so above the byte bound
    the same semantics run as two anti hash-joins (src then dst) with
    nothing node-scaled on the driver. Returns an unmaterialized
    Dataset either way."""
    import ray

    from .join import hash_join
    from .shuffle import collect_sorted_keys, sorted_membership

    if n_dead * 8 <= broadcast_limit_bytes:
        dead = collect_sorted_keys(dead_ds, "node")
        ref = ray.put(dead)

        def keep(t: pa.Table) -> pa.Table:
            dd = ray.get(ref)
            s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = (~sorted_membership(dd, s)) & (~sorted_membership(dd, d))
            return t.filter(pa.array(m))

        return live_ds.map_batches(keep, batch_format="pyarrow")
    half = hash_join(live_ds, dead_ds, on="src", right_on="node",
                     how="anti", n_parts=n_parts)
    # bound the block count: joins sum their inputs' blocks, and this
    # output is loop-carried (next wave's live set)
    return hash_join(half, dead_ds, on="dst", right_on="node",
                     how="anti", n_parts=n_parts).repartition(n_parts)


def _src_degrees_ds(live_ds, n_parts: int = 16):
    """Per-src live degree as a Dataset (node, deg): per-batch unique
    counts, one salted node-functional exchange. The Dataset-resident
    replacement for the broadcast paths' bincount-into-|V|-vector."""
    from .shuffle import salted_partition_apply

    def partial(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "deg": pa.array(c.astype(np.int64))})

    return salted_partition_apply(
        live_ds.map_batches(partial, batch_format="pyarrow"),
        lambda df: df.groupby("node", as_index=False)["deg"].sum(),
        combine_key=lambda t: t["node"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts)


def _core_decomposition_distributed(edges_ds, nodes_ds, n_alive: int,
                                    max_waves: int,
                                    n_parts: int = 16,
                                    broadcast_limit_bytes: int = 256 << 20
                                    ) -> pd.DataFrame:
    """Web-scale k-core path: the SAME Batagelj peel waves as the
    broadcast path, with every piece of node-scaled state a DATASET —
    the _pagerank_distributed hash-join algebra. Per wave: one salted
    per-src degree exchange over the live edge Dataset, one node-scaled
    left hash_join (alive ← deg, null→0), a scalar ``min`` for the
    k-jump (raising k is a free re-check of the same degrees, so every
    wave removes ≥1 node — identical to the broadcast path's inner
    k-increment loop), a filter for the doomed set, one anti-join
    shrinking alive, and a byte-probed edge shrink
    (_drop_edges_touching). The driver sees only scalars per wave; the
    peeled (node, coreness) rows accumulate as Datasets and are pulled
    ONCE at the end — the result itself, the quantity the pandas
    return contract holds by definition (callers at 10^9+ nodes would
    consume the union as a Dataset / write_parquet instead)."""
    import pyarrow.compute as pc

    from .join import hash_join

    alive_ds = nodes_ds.materialize()
    live_ds = edges_ds.materialize()
    n_live = live_ds.count()
    done = []                               # Datasets (node, coreness)
    k = 1
    waves = 0
    while n_alive > 0:
        waves += 1
        if waves > max_waves:
            raise RuntimeError(f"core_decomposition: no convergence "
                               f"after {max_waves} waves")
        if n_live == 0:
            # all remaining alive nodes have live degree 0 — doomed at
            # the current k, exactly the broadcast path's deg<k branch
            doomed = alive_ds
            n_doomed = n_alive
        else:
            deg_ds = _src_degrees_ds(live_ds, n_parts=n_parts)
            degf = _compact(hash_join(
                alive_ds, deg_ds, on="node", how="left",
                n_parts=n_parts).map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "deg": pc.fill_null(t["deg"], 0)}),
                batch_format="pyarrow"))
            m = int(degf.min("deg"))
            if m >= k:                      # the k-jump (see docstring)
                k = m + 1
            kk = k
            doomed = _compact(degf.map_batches(
                lambda t, _k=kk: t.filter(pc.less(t["deg"], _k))
                .select(["node"]),
                batch_format="pyarrow"))
            n_doomed = doomed.count()
        cns = np.int64(k - 1)
        done.append(doomed.map_batches(
            lambda t, _c=cns: pa.table({
                "node": t["node"],
                "coreness": pa.array(np.full(len(t), _c, np.int64))}),
            batch_format="pyarrow").materialize())
        n_alive -= n_doomed
        if n_alive == 0:
            break
        alive_ds = _compact(hash_join(alive_ds, doomed, on="node",
                                      how="anti", n_parts=n_parts))
        live_ds = _drop_edges_touching(
            live_ds, doomed, n_doomed, n_parts=n_parts,
            broadcast_limit_bytes=broadcast_limit_bytes).materialize()
        n_live = live_ds.count()

    out = pd.concat([d.to_pandas() for d in done], ignore_index=True)
    return pd.DataFrame({
        "node_id": out["node"].astype("int64"),
        "coreness": out["coreness"].astype("int64")}) \
        .sort_values("node_id").reset_index(drop=True)


def core_decomposition(edges_ds,
                       node_broadcast_limit: int = 50_000_000,
                       max_waves: int = 100_000,
                       broadcast_limit_bytes: int = 256 << 20,
                       n_parts: int = 16) -> pd.DataFrame:
    """Exact k-core decomposition — coreness(v) = the largest k such
    that v survives in a subgraph of minimum degree k — over an
    undirected graph given as a BIDIRECTIONAL edge Dataset (src, dst
    both directions, the trade_edges contract, so a bincount over src
    IS the live degree). The density/community primitive PageRank and
    triangles don't give you: spam-farm stripping and seed selection
    peel the crawl host graph by coreness.

    Distributed peeling (Batagelj–Žaberšnik order, Montresor-et-al
    round structure): phase k removes, in WAVES, every node whose live
    degree is < k; each wave is ONE streamed bincount pass over the
    index-encoded edge Dataset with the alive bitmap broadcast via
    ray.put — the edge set never visits the driver, only node-scaled
    vectors do (the pagerank broadcast-path convention; the number of
    waves is the graph's degeneracy ordering depth, typically
    O(tens)). Above ``node_broadcast_limit`` nodes the same waves run
    with degrees, the alive set, and the edge shrink all
    Dataset-resident (``_core_decomposition_distributed``) — the
    pagerank two-path convention, parity-pinned with a forced-zero
    limit test.

    Returns pandas (node_id, coreness:int64) sorted by node_id, one
    row per node appearing in any edge."""
    import ray

    edges_ds = edges_ds.repartition(16).materialize()
    if edges_ds.count() == 0:
        return pd.DataFrame({"node_id": pd.Series(dtype="int64"),
                             "coreness": pd.Series(dtype="int64")})

    nodes, nodes_ds, n = _node_universe_switch(edges_ds,
                                               node_broadcast_limit)
    if nodes_ds is not None:
        return _core_decomposition_distributed(
            edges_ds, nodes_ds, n, max_waves, n_parts=n_parts,
            broadcast_limit_bytes=broadcast_limit_bytes)

    # index-encode ONCE so every wave streams int32 pairs, not raw ids
    nref = ray.put(nodes)

    def to_idx(t: pa.Table) -> pa.Table:
        nd = ray.get(nref)
        s = np.searchsorted(
            nd, t["src"].to_numpy(zero_copy_only=False).astype(np.int64))
        d = np.searchsorted(
            nd, t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"si": pa.array(s.astype(np.int32)),
                         "di": pa.array(d.astype(np.int32))})

    eidx = edges_ds.map_batches(to_idx, batch_format="pyarrow") \
        .materialize()

    alive = np.ones(n, dtype=bool)
    coreness = np.zeros(n, dtype=np.int64)
    k = 1
    waves = 0
    while alive.any():
        aref = ray.put(alive)

        def deg_partial(t: pa.Table, _aref=aref) -> pa.Table:
            al = ray.get(_aref)
            s = t["si"].to_numpy(zero_copy_only=False)
            d = t["di"].to_numpy(zero_copy_only=False)
            m = al[s] & al[d]
            sums = np.bincount(s[m], minlength=len(al))
            hit = np.nonzero(sums)[0]
            return pa.table({
                "idx": pa.array(hit.astype(np.int64)),
                "partial": pa.array(sums[hit].astype(np.int64))})

        parts = eidx.map_batches(deg_partial, batch_format="pyarrow") \
            .to_pandas()
        deg = np.zeros(n, dtype=np.int64)
        if "idx" in parts.columns:      # all-empty partials lose schema
            np.add.at(deg, parts["idx"].to_numpy(),
                      parts["partial"].to_numpy())
        # k-increments are free re-checks of the SAME driver-resident
        # degree vector (removals invalidate it, raising k does not) —
        # so every distributed wave below removes >= 1 node
        doomed = alive & (deg < k)
        while alive.any() and not doomed.any():
            k += 1
            doomed = alive & (deg < k)
        coreness[doomed] = k - 1
        alive &= ~doomed
        waves += 1
        if waves > max_waves:
            raise RuntimeError(f"core_decomposition: no convergence "
                               f"after {max_waves} waves")

    return pd.DataFrame({"node_id": nodes, "coreness": coreness})


def trade_coreness(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition of the bidirectional customer↔supplier
    trade graph (same edge derivation as trade_pagerank)."""
    return core_decomposition(trade_edges(sf_dir))


def triangle_counts(edges_ds, n_parts: int = 64) -> pd.DataFrame:
    """Per-node triangle counts over an undirected simple graph given as
    a CANONICAL edge Dataset (u:int64, v:int64, u < v, distinct rows).
    Returns pandas (node_id, n_triangles) for every node in ≥1 triangle,
    sorted by node_id — node-scaled, the quantity any consumer holds.

    Engine shape (the standard distributed triangle scheme — degree-
    ordered orientation, cf. Suri & Vassilvitskii WWW'11 "Counting
    triangles and the curse of the last reducer"): orienting every edge
    from its lower-(degree, id) endpoint to the higher bounds per-node
    out-degree at O(sqrt(m)), so the wedge blowup is O(m^1.5) total and
    immune to hub skew — a raw groupby(src) pairing without the
    orientation is quadratic in the hottest node's degree.

      1. degrees — one salted exchange over edge endpoints;
      2. orientation — degrees attach via two hash_join exchanges
         (node-scaled right side; nothing node-scaled on the driver);
      3. wedges — oriented edges group by src (salted exchange), each
         src emits its out-neighbor pairs, canonicalized (a < b);
      4. close — wedges ⋈ canonical edges, partitioned by the pair HASH
         but matched inside each part on the exact (a, b) ints (the
         house collision-only-co-locates pattern), each surviving wedge
         being exactly one triangle, counted once;
      5. per-node counts — flat-emit the 3 corners, salted count.
    """
    from .shuffle import salted_partition_apply
    from .join import hash_join

    edges_ds = edges_ds.materialize()  # reused: degrees, orientation, close

    # 1. degrees (one row per endpoint occurrence -> count per node)
    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["v"].to_numpy(zero_copy_only=False).astype(np.int64)]),
            pa.int64())})

    def count_nodes(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", sort=False).size().reset_index(name="deg")
        return out.astype({"node": "int64", "deg": "int64"})

    degrees = salted_partition_apply(
        edges_ds.map_batches(endpoints, batch_format="pyarrow"),
        count_nodes, lambda t: t["node"].to_numpy().astype(np.int64),
        n_parts=n_parts)

    # 2. orientation: low (deg, id) -> high (deg, id)
    du = degrees.map_batches(
        lambda t: t.rename_columns(["u", "du"]), batch_format="pyarrow")
    dv = degrees.map_batches(
        lambda t: t.rename_columns(["v", "dv"]), batch_format="pyarrow")
    e = hash_join(hash_join(edges_ds, du, on="u", n_parts=n_parts),
                  dv, on="v", n_parts=n_parts)

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        duv = t["du"].to_numpy(zero_copy_only=False)
        dvv = t["dv"].to_numpy(zero_copy_only=False)
        u_first = (duv < dvv) | ((duv == dvv) & (u < v))
        return pa.table({
            "src": pa.array(np.where(u_first, u, v), pa.int64()),
            "dst": pa.array(np.where(u_first, v, u), pa.int64())})

    oriented = e.map_batches(orient, batch_format="pyarrow")

    # 3. wedges: per src, all out-neighbor pairs (canonical a < b), src rides
    def emit_wedges(df: pd.DataFrame) -> pd.DataFrame:
        srcs, a_out, b_out, s_out = df["src"].to_numpy(), [], [], []
        dsts = df["dst"].to_numpy()
        order = np.argsort(srcs, kind="mergesort")
        srcs, dsts = srcs[order], dsts[order]
        bounds = np.flatnonzero(np.r_[True, srcs[1:] != srcs[:-1], True])
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            n = hi - lo
            if n < 2:
                continue
            nb = np.sort(dsts[lo:hi])
            ia, ib = np.triu_indices(n, k=1)
            a_out.append(nb[ia]); b_out.append(nb[ib])
            s_out.append(np.full(ia.size, srcs[lo], np.int64))
        if not a_out:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(a_out),
                             "b": np.concatenate(b_out),
                             "s": np.concatenate(s_out)})

    wedges = salted_partition_apply(
        oriented, emit_wedges,
        lambda t: t["src"].to_numpy().astype(np.int64), n_parts=n_parts)

    # 4. close the wedges against the edge set: one pair-hash-keyed
    # exchange each side, exact (a, b) merge inside the part
    def pair_hash(t: pa.Table, ca: str, cb: str) -> np.ndarray:
        with np.errstate(over="ignore"):
            k = (t[ca].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + t[cb].to_numpy().astype(np.uint64))
        return k.view(np.int64)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "is_edge", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    def edge_ab(t: pa.Table) -> pa.Table:
        return pa.table({"a": t["u"], "b": t["v"],
                         "s": pa.array(np.zeros(t.num_rows, np.int64))})

    both = wedges.map_batches(tag(0), batch_format="pyarrow").union(
        edges_ds.map_batches(edge_ab, batch_format="pyarrow")
        .map_batches(tag(1), batch_format="pyarrow"))

    def close_part(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["is_edge"] == 0]
        eset = df[df["is_edge"] == 1][["a", "b"]]
        hit = w.merge(eset, on=["a", "b"], how="inner")
        return hit[["a", "b", "s"]].reset_index(drop=True)

    tri = salted_partition_apply(
        both, close_part, lambda t: pair_hash(t, "a", "b"),
        n_parts=n_parts)

    # 5. per-node participation counts
    def corners(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.array(np.concatenate([
            t["a"].to_numpy(zero_copy_only=False),
            t["b"].to_numpy(zero_copy_only=False),
            t["s"].to_numpy(zero_copy_only=False)]), pa.int64())})

    def count_tri(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", sort=False).size() \
            .reset_index(name="n_triangles")
        return out.astype({"node": "int64", "n_triangles": "int64"})

    per_node = salted_partition_apply(
        tri.map_batches(corners, batch_format="pyarrow"),
        count_tri, lambda t: t["node"].to_numpy().astype(np.int64),
        n_parts=n_parts).to_pandas()
    return per_node.rename(columns={"node": "node_id"}) \
        .sort_values("node_id").reset_index(drop=True)


def part_coorder_edges(sf_dir: str, n_parts: int = 64):
    """Canonical distinct (u < v) part co-order edges: parts that ship in
    the same order. One exchange on l_orderkey generates in-order pairs
    (per-order fan-out is order-line-bounded, ~4-7 lines in TPC-H-ish
    data), a second pair-hash exchange makes them globally distinct."""
    from .analytics import read
    from .shuffle import salted_partition_apply

    li = read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs_in_order(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["l_orderkey", "l_partkey"]) \
            .sort_values(["l_orderkey", "l_partkey"], kind="mergesort")
        ok = df["l_orderkey"].to_numpy()
        pk = df["l_partkey"].to_numpy().astype(np.int64)
        bounds = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1], True])
        a_out, b_out = [], []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            n = hi - lo
            if n < 2:
                continue
            ia, ib = np.triu_indices(n, k=1)
            a_out.append(pk[lo:hi][ia]); b_out.append(pk[lo:hi][ib])
        if not a_out:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        return pd.DataFrame({"u": np.concatenate(a_out),
                             "v": np.concatenate(b_out)}).drop_duplicates()

    in_order = salted_partition_apply(
        li, pairs_in_order,
        lambda t: t["l_orderkey"].to_numpy().astype(np.int64),
        n_parts=n_parts)

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["u", "v"]).reset_index(drop=True)

    def uv_hash(t: pa.Table) -> np.ndarray:
        with np.errstate(over="ignore"):
            k = (t["u"].to_numpy().astype(np.uint64)
                 * np.uint64(0x9E3779B97F4A7C15)
                 + t["v"].to_numpy().astype(np.uint64))
        return k.view(np.int64)

    return salted_partition_apply(in_order, distinct, uv_hash,
                                  n_parts=n_parts)


def part_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-part triangle counts of the part co-order graph — the
    co-occurrence-network form of triangle counting (node_id = partkey,
    n_triangles = closed co-order triples through it)."""
    return triangle_counts(part_coorder_edges(sf_dir))


def trade_ppr(sf_dir: str, damping: float = 0.85, iters: int = 3,
              node_broadcast_limit: int = 50_000_000) -> pd.DataFrame:
    """Personalized PageRank over the ONE-WAY cust→supp trade graph
    from the two smallest customer nodes (deterministic seed pick,
    mirrored in the SQL oracle): teleport, initial mass, and the
    dangling redistribution all concentrate on the seeds — the "pages
    relevant to THIS site" crawl-prioritization signal, vs the global
    importance trade_pagerank gives. Suppliers are pure sinks here, so
    the seed-directed dangling term is exercised, not just the teleport."""
    edges = trade_edges_directed(sf_dir).materialize()

    def min2(t: pa.Table) -> pa.Table:
        s = np.unique(t["src"].to_numpy(zero_copy_only=False))[:2]
        return pa.table({"node_id": pa.array(s, pa.int64())})

    partials = edges.map_batches(min2, batch_format="pyarrow") \
        .to_pandas()["node_id"].to_numpy()
    seeds = np.unique(partials)[:2].tolist()
    df = pagerank(edges, damping=damping, iters=iters,
                  node_broadcast_limit=node_broadcast_limit,
                  personalize=seeds)
    df["score"] = df["score"].round(6)
    return df.sort_values("node_id").reset_index(drop=True)


def _scc_distributed(edges_ds, nodes_ds, n_active: int,
                     max_rounds: int, max_waves: int,
                     n_parts: int = 16,
                     broadcast_limit_bytes: int = 256 << 20
                     ) -> pd.DataFrame:
    """Web-scale SCC path: the SAME FW-BW-Trim rounds as the broadcast
    path with every piece of node-scaled state a DATASET — active set,
    colors, and backward marks live in the object store and move
    through hash_join / salted exchanges (_pagerank_distributed
    algebra); the driver sees only per-wave scalars.

    Per trim wave: ONE combined (out-degree, in-degree) salted exchange
    over the live edges, a node-scaled left join, a filter, an
    anti-join, a byte-probed edge shrink. Per color wave: one
    hash_join(edges, colors on src) + salted per-dst max + node-scaled
    left join + change count. The backward pass is a reverse BFS from
    the color roots over the SAME-COLOR edge subset (computed once per
    round with two edge joins): per wave one semi-join against the
    frontier, a salted distinct, an anti-join vs marks — the fixpoint
    the broadcast path's repeated full scans reach, one frontier hop
    at a time. Retired (node, scc) rows accumulate as Datasets, pulled
    ONCE at the end (the result itself — the pandas return contract;
    10^9-node callers would consume the union as a Dataset)."""
    import pyarrow.compute as pc

    from .join import hash_join
    from .shuffle import salted_partition_apply

    def node_fold(t: pa.Table) -> np.ndarray:
        return t["node"].to_numpy(zero_copy_only=False).astype(np.int64)

    active_ds = nodes_ds.materialize()
    live_ds = edges_ds.materialize()
    n_live = live_ds.count()
    done = []                                 # Datasets (node, scc)

    def retire_as_singletons(kill_ds):
        done.append(kill_ds.map_batches(
            lambda t: pa.table({"node": t["node"], "scc": t["node"]}),
            batch_format="pyarrow").materialize())

    for _round in range(max_rounds):
        if n_active == 0:
            break

        # --- 1. TRIM to fixpoint ---
        for _wave in range(max_waves):
            if n_live == 0:
                # no live edges: every remaining active node has
                # od = ind = 0 — all are singleton SCCs
                retire_as_singletons(active_ds)
                n_active = 0
                break

            def deg_partial(t: pa.Table) -> pa.Table:
                s = t["src"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                d = t["dst"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                us, cs = np.unique(s, return_counts=True)
                ud, cd = np.unique(d, return_counts=True)
                return pa.table({
                    "node": pa.array(np.concatenate([us, ud]),
                                     pa.int64()),
                    "od": pa.array(np.concatenate(
                        [cs, np.zeros(ud.size, np.int64)])
                        .astype(np.int64)),
                    "ind": pa.array(np.concatenate(
                        [np.zeros(us.size, np.int64), cd])
                        .astype(np.int64))})

            degs = salted_partition_apply(
                live_ds.map_batches(deg_partial, batch_format="pyarrow"),
                lambda df: df.groupby("node", as_index=False)[
                    ["od", "ind"]].sum(),
                combine_key=node_fold, n_parts=n_parts)
            kill = _compact(hash_join(
                active_ds, degs, on="node", how="left",
                n_parts=n_parts).map_batches(
                lambda t: t.filter(pc.or_(
                    pc.equal(pc.fill_null(t["od"], 0), 0),
                    pc.equal(pc.fill_null(t["ind"], 0), 0)))
                .select(["node"]),
                batch_format="pyarrow"))
            nk = kill.count()
            if nk == 0:
                break
            retire_as_singletons(kill)
            n_active -= nk
            if n_active == 0:
                break
            active_ds = _compact(hash_join(active_ds, kill, on="node",
                                           how="anti", n_parts=n_parts))
            live_ds = _drop_edges_touching(
                live_ds, kill, nk, n_parts=n_parts,
                broadcast_limit_bytes=broadcast_limit_bytes) \
                .materialize()
            n_live = live_ds.count()
        else:
            if n_active:
                raise RuntimeError("SCC trim did not converge")
        if n_active == 0:
            break

        # --- 2. COLOR: forward max-label propagation to fixpoint ---
        color_ds = active_ds.map_batches(
            lambda t: pa.table({"node": t["node"], "color": t["node"]}),
            batch_format="pyarrow").materialize()
        for _wave in range(max_waves):
            col_src = color_ds.map_batches(
                lambda t: pa.table({"src": t["node"], "col": t["color"]}),
                batch_format="pyarrow")
            ec = hash_join(live_ds, col_src, on="src", how="inner",
                           n_parts=n_parts)

            def max_partial(t: pa.Table) -> pa.Table:
                d = t["dst"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                c = t["col"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                order = np.argsort(d, kind="stable")
                ds_, cs_ = d[order], c[order]
                grp = np.concatenate([[True], ds_[1:] != ds_[:-1]]) \
                    if ds_.size else np.zeros(0, bool)
                starts = np.nonzero(grp)[0]
                mx = (np.maximum.reduceat(cs_, starts)
                      if starts.size else np.zeros(0, np.int64))
                return pa.table({
                    "node": pa.array(ds_[starts] if starts.size
                                     else np.zeros(0, np.int64),
                                     pa.int64()),
                    "m": pa.array(mx.astype(np.int64))})

            maxin = salted_partition_apply(
                ec.map_batches(max_partial, batch_format="pyarrow"),
                lambda df: df.groupby("node", as_index=False)["m"].max(),
                combine_key=node_fold, n_parts=n_parts)

            def upd(t: pa.Table) -> pa.Table:
                cur = t["color"].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                # null m = no in-edge from the active subgraph: keep
                # the current color (int64 min never wins a max)
                m = pc.fill_null(t["m"], np.iinfo(np.int64).min) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
                new = np.maximum(cur, m)
                return pa.table({
                    "node": t["node"],
                    "color": pa.array(new, pa.int64()),
                    "chg": pa.array((new != cur).astype(np.int64))})

            upd_ds = _compact(hash_join(
                color_ds, maxin, on="node", how="left",
                n_parts=n_parts).map_batches(
                upd, batch_format="pyarrow"))
            changed = int(upd_ds.sum("chg") or 0)
            color_ds = upd_ds.map_batches(
                lambda t: t.select(["node", "color"]),
                batch_format="pyarrow").materialize()
            if changed == 0:
                break
        else:
            raise RuntimeError("SCC coloring did not converge")

        # --- 3. BACKWARD: reverse BFS from color roots along
        # same-color edges (computed once per round) ---
        e1 = hash_join(live_ds,
                       color_ds.map_batches(
                           lambda t: pa.table({"src": t["node"],
                                               "cs": t["color"]}),
                           batch_format="pyarrow"),
                       on="src", how="inner", n_parts=n_parts)
        bedges = hash_join(e1,
                           color_ds.map_batches(
                               lambda t: pa.table({"dst": t["node"],
                                                   "cd": t["color"]}),
                               batch_format="pyarrow"),
                           on="dst", how="inner", n_parts=n_parts) \
            .map_batches(
                lambda t: t.filter(pc.equal(t["cs"], t["cd"]))
                .select(["src", "dst"]),
                batch_format="pyarrow")
        bedges = _compact(bedges, k=n_parts)
        mark_ds = _compact(color_ds.map_batches(
            lambda t: t.filter(pc.equal(t["node"], t["color"]))
            .select(["node"]),
            batch_format="pyarrow"))
        frontier = mark_ds
        for _wave in range(max_waves):
            cand = hash_join(
                bedges,
                frontier.map_batches(
                    lambda t: pa.table({"dst": t["node"]}),
                    batch_format="pyarrow"),
                on="dst", how="semi", n_parts=n_parts)
            srcs = _compact(salted_partition_apply(
                cand.map_batches(
                    lambda t: pa.table({"node": t["src"]}),
                    batch_format="pyarrow"),
                lambda df: df.drop_duplicates("node"),
                combine_key=node_fold, n_parts=n_parts))
            if srcs.count() == 0:
                break
            newly = _compact(hash_join(srcs, mark_ds, on="node",
                                       how="anti", n_parts=n_parts))
            if newly.count() == 0:
                break
            mark_ds = _compact(mark_ds.union(newly))
            frontier = newly
        else:
            raise RuntimeError("SCC backward pass did not converge")

        finished = hash_join(mark_ds, color_ds, on="node", how="inner",
                             n_parts=n_parts)
        done.append(finished.map_batches(
            lambda t: pa.table({"node": t["node"], "scc": t["color"]}),
            batch_format="pyarrow").materialize())
        nm = mark_ds.count()
        n_active -= nm
        if n_active == 0:
            break
        active_ds = _compact(hash_join(active_ds, mark_ds, on="node",
                                       how="anti", n_parts=n_parts))
        live_ds = _drop_edges_touching(
            live_ds, mark_ds, nm, n_parts=n_parts,
            broadcast_limit_bytes=broadcast_limit_bytes).materialize()
        n_live = live_ds.count()
    else:
        if n_active:
            raise RuntimeError("SCC peel did not converge in max_rounds")

    out = pd.concat([d.to_pandas() for d in done], ignore_index=True)
    return pd.DataFrame({
        "node_id": out["node"].astype("int64"),
        "scc_id": out["scc"].astype("int64")}) \
        .sort_values("node_id").reset_index(drop=True)


def strongly_connected_components(edges_ds, max_rounds: int = 50,
                                  max_waves: int = 200,
                                  node_broadcast_limit: int = 50_000_000,
                                  broadcast_limit_bytes: int = 256 << 20,
                                  n_parts: int = 16) -> pd.DataFrame:
    """Exact SCC decomposition of a directed edge Dataset (src, dst) —
    the FW-BW-Trim / coloring family (Fleischer-Hendrickson-Pinar 2000,
    Orzan 2004; the standard distributed SCC since Tarjan's stack is
    inherently sequential). Returns (node_id, scc_id) with scc_id = the
    MAXIMUM node id in the component (the coloring root), matching an
    oracle that derives components from mutual reachability.

    Rounds: (1) TRIM — nodes with zero in- or out-degree in the active
    subgraph are singleton SCCs, peeled to fixpoint (kills the DAG
    fringe that would otherwise cost one round each); (2) COLOR —
    forward max-label propagation to fixpoint partitions active nodes
    into color classes rooted at their max reachable-from id;
    (3) BACKWARD — within each color class, nodes that reach the root
    against the edges form the root's SCC (every color class peels its
    root SCC simultaneously — one round retires MANY components).
    Raises if max_rounds/max_waves don't converge (loud, like the CC
    non-convergence raise).

    Scale shape (the pagerank broadcast pattern): driver state is FOUR
    O(|V|) arrays (node ids, active, color, scc); edges map to index
    space ONCE (node-array broadcast + searchsorted) and the indexed
    edge Dataset materializes in the object store; every trim wave /
    color wave / backward wave is one streaming map_batches over it
    emitting per-batch partial reductions (bincounts, grouped maxima,
    marked-source indices) — edge-scaled data never lands on the
    driver. Above ``node_broadcast_limit`` nodes the SAME rounds run
    with active set, colors, marks, and the edge shrink all
    Dataset-resident (``_scc_distributed`` — the _pagerank_distributed
    hash_join algebra), parity-pinned with a forced-zero limit test."""
    import ray

    # --- node universe + the |V| switch (scale-safe: the driver sees
    # only a count before a path is chosen) ---
    edges_ds = edges_ds.repartition(16).materialize()
    if edges_ds.count() == 0:
        return pd.DataFrame({"node_id": pd.Series(dtype="int64"),
                             "scc_id": pd.Series(dtype="int64")})
    nodes, nodes_ds, n = _node_universe_switch(edges_ds,
                                               node_broadcast_limit)
    if nodes_ds is not None:
        return _scc_distributed(
            edges_ds, nodes_ds, n, max_rounds, max_waves,
            n_parts=n_parts,
            broadcast_limit_bytes=broadcast_limit_bytes)
    nref = ray.put(nodes)

    def to_idx(t: pa.Table) -> pa.Table:
        nd = ray.get(nref)
        si = np.searchsorted(nd, t["src"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)).astype(np.int64)
        di = np.searchsorted(nd, t["dst"].to_numpy(zero_copy_only=False)
                             .astype(np.int64)).astype(np.int64)
        return pa.table({"si": pa.array(si), "di": pa.array(di)})

    iedges = edges_ds.map_batches(to_idx, batch_format="pyarrow") \
        .materialize()

    active = np.ones(n, dtype=bool)
    scc = np.full(n, -1, dtype=np.int64)

    def stream(fn) -> pd.DataFrame:
        return iedges.map_batches(fn, batch_format="pyarrow").to_pandas()

    for _round in range(max_rounds):
        if not active.any():
            break

        # --- 1. TRIM to fixpoint ---
        for _wave in range(max_waves):
            aref = ray.put(active)

            def degs(t: pa.Table) -> pa.Table:
                act = ray.get(aref)
                si = t["si"].to_numpy()
                di = t["di"].to_numpy()
                live = act[si] & act[di]
                od = np.bincount(si[live], minlength=len(act))
                ind = np.bincount(di[live], minlength=len(act))
                nz = np.nonzero(od | ind)[0]
                return pa.table({"i": pa.array(nz, pa.int64()),
                                 "od": pa.array(od[nz], pa.int64()),
                                 "ind": pa.array(ind[nz], pa.int64())})

            d = stream(degs)
            od = np.zeros(n, np.int64)
            ind = np.zeros(n, np.int64)
            if len(d):
                np.add.at(od, d["i"].to_numpy(), d["od"].to_numpy())
                np.add.at(ind, d["i"].to_numpy(), d["ind"].to_numpy())
            kill = active & ((od == 0) | (ind == 0))
            if not kill.any():
                break
            scc[kill] = nodes[kill]
            active &= ~kill
        else:
            # a kill on the final allowed wave may have finished the
            # job — only raise if work genuinely remains (review
            # finding: exact-boundary convergence raised spuriously)
            if active.any():
                raise RuntimeError("SCC trim did not converge")
        if not active.any():
            break

        # --- 2. COLOR: forward max-label propagation to fixpoint ---
        color = np.where(active, nodes, np.int64(-1))
        for _wave in range(max_waves):
            cref = ray.put((color, active))

            def fwd(t: pa.Table) -> pa.Table:
                col, act = ray.get(cref)
                si = t["si"].to_numpy()
                di = t["di"].to_numpy()
                live = act[si] & act[di]
                si, di = si[live], di[live]
                if not len(si):
                    return pa.table({"i": pa.array([], pa.int64()),
                                     "m": pa.array([], pa.int64())})
                order = np.argsort(di, kind="stable")
                di_s, cs = di[order], col[si[order]]
                grp = np.concatenate([[True], di_s[1:] != di_s[:-1]])
                starts = np.nonzero(grp)[0]
                mx = np.maximum.reduceat(cs, starts)
                return pa.table({"i": pa.array(di_s[starts], pa.int64()),
                                 "m": pa.array(mx, pa.int64())})

            p = stream(fwd)
            new = color.copy()
            if len(p):
                np.maximum.at(new, p["i"].to_numpy(), p["m"].to_numpy())
            if (new == color).all():
                break
            color = new
        else:
            raise RuntimeError("SCC coloring did not converge")

        # --- 3. BACKWARD: reach the color root against the edges ---
        mark = active & (color == nodes)
        for _wave in range(max_waves):
            mref = ray.put((mark, color, active))

            def back(t: pa.Table) -> pa.Table:
                mk, col, act = ray.get(mref)
                si = t["si"].to_numpy()
                di = t["di"].to_numpy()
                hit = (act[si] & act[di] & mk[di] & ~mk[si]
                       & (col[si] == col[di]))
                return pa.table({"i": pa.array(
                    np.unique(si[hit]), pa.int64())})

            p = stream(back)
            if not len(p):
                break
            newly = p["i"].to_numpy()
            before = mark.sum()
            mark[newly] = True
            if mark.sum() == before:
                break
        else:
            raise RuntimeError("SCC backward pass did not converge")

        scc[mark] = color[mark]
        active &= ~mark
    else:
        # exact-boundary convergence: emptying `active` in round
        # max_rounds-1 exhausts the for without re-entering the top
        # break — a correct result, not a failure (review finding)
        if active.any():
            raise RuntimeError("SCC peel did not converge in max_rounds")

    return pd.DataFrame({"node_id": pd.Series(nodes, dtype="int64"),
                         "scc_id": pd.Series(scc, dtype="int64")}) \
        .sort_values("node_id").reset_index(drop=True)


def link_prediction_scores(edges_ds, k: int = 50, n_parts: int = 64):
    """Top-k link-prediction candidates over an undirected graph given
    as a BIDIRECTIONAL edge Dataset (the trade_edges contract): for
    every non-adjacent pair (a, b) sharing ≥1 neighbor, the
    common-neighbor count and the Adamic–Adar score
    Σ_{c ∈ N(a)∩N(b)} 1/ln(deg(c)) — the classic local link
    predictors (Liben-Nowell & Kleinberg 2003). Returns pandas
    (a, b, common_neighbors, adamic_adar) — aa rounded to 4 dp, ranked
    (aa desc, a asc, b asc), limit k.

    Scale shape: degrees from one salted per-src exchange ride back
    onto the edges via hash_join (never a driver map); WEDGES explode
    where the center lives — one center-keyed exchange groups each
    node's neighbor list, the per-part self-merge emits (u, v,
    1/ln(deg_center)) rows (wedge volume: Σ deg(c)², the triangle-
    counting bound — a hot hub is quadratic in ITS degree, the
    inherent cost of exact local link prediction; cap hubs upstream if
    that bound breaks); pair scores fold on one pair-keyed salted
    exchange where existing-edge marker rows ride along, so the
    adjacency exclusion is EXACT in-part (a, b) equality — never a
    collision-prone fold comparison. The final rank is a Dataset sort
    + limit; only k rows reach the driver."""
    from .join import hash_join
    from .shuffle import salted_partition_apply

    # consumed three times (degrees, wedge join, edge markers) — an
    # unmaterialized input pipeline would re-execute per consumer
    edges_ds = edges_ds.materialize()
    deg_ds = _src_degrees_ds(edges_ds, n_parts=n_parts)
    # arrow-map rename: right_on would go through rename_columns,
    # which rejects the pandas blocks the degree exchange emits
    ewd = hash_join(edges_ds, _arrow_rename(deg_ds, {"node": "src"}),
                    on="src", how="inner", n_parts=n_parts)

    # wedge candidates: group (center=src) -> neighbors, self-merge
    def center_rows(t: pa.Table) -> pa.Table:
        return pa.table({"center": t["src"], "doc_id": t["dst"],
                         "deg": t["deg"]})

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # the shared bucket self-merge with the CENTER as the bucket
        # key; deg rides the rows, so deg_x IS the center's degree
        # (distinct-edges input contract — multi-edges would
        # double-count wedges)
        from .dedup import _self_merge_pairs
        m = _self_merge_pairs(df[["center", "doc_id", "deg"]],
                              ["center"], cap=None)
        if m.empty:
            return pd.DataFrame({
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "w": pd.Series(dtype="float64"),
                "is_edge": pd.Series(dtype="int64")})
        w = 1.0 / np.log(m["deg_x"].to_numpy(dtype=np.float64))
        return pd.DataFrame({
            "a": pd.Series(m["doc_id_x"].to_numpy(), dtype="int64"),
            "b": pd.Series(m["doc_id_y"].to_numpy(), dtype="int64"),
            "w": pd.Series(w, dtype="float64"),
            "is_edge": pd.Series(np.zeros(len(m), np.int64))})

    wedges = salted_partition_apply(
        ewd.map_batches(center_rows, batch_format="pyarrow"),
        wedge_pairs,
        combine_key=lambda t: t["center"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts)

    # existing edges as canonical (min, max) marker rows riding the
    # same pair exchange — exact in-part exclusion
    def edge_markers(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s < d                  # bidirectional input: one copy
        return pa.table({
            "a": pa.array(s[keep]), "b": pa.array(d[keep]),
            "w": pa.array(np.zeros(int(keep.sum()), np.float64)),
            "is_edge": pa.array(np.ones(int(keep.sum()), np.int64))})

    from .dedup import _pair_ab_key

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).agg(
            cn=("is_edge", "size"), w=("w", "sum"),
            ne=("is_edge", "sum"))
        # marker rows inflate cn by their own count — subtract, then
        # drop adjacent pairs and pairs with no true wedge
        g["cn"] = g["cn"] - g["ne"]
        g = g[(g["ne"] == 0) & (g["cn"] > 0)]
        return pd.DataFrame({
            "a": pd.Series(g["a"].to_numpy(), dtype="int64"),
            "b": pd.Series(g["b"].to_numpy(), dtype="int64"),
            "common_neighbors": pd.Series(g["cn"].to_numpy(),
                                          dtype="int64"),
            "adamic_adar": pd.Series(
                np.round(g["w"].to_numpy(dtype=np.float64), 4),
                dtype="float64")})

    scored = salted_partition_apply(
        wedges.union(edges_ds.map_batches(edge_markers,
                                          batch_format="pyarrow")),
        score_part, _pair_ab_key, n_parts=n_parts)
    out = scored.sort(["adamic_adar", "a", "b"],
                      descending=[True, False, False]) \
        .limit(k).to_pandas()
    return out.reset_index(drop=True)


def trade_edges_sparse(sf_dir: str):
    """Bidirectional SPARSE trade graph: distinct (cust, supp) pairs
    that ever traded at quantity ≤ 2 — the tail-extreme filter the
    cyclic SCC graph uses, here symmetric. The full trade graph's hub
    suppliers make Σ deg² (the exact wedge bound of local link
    prediction) run to ~5·10^8 at sf0.1; link prediction on the RARE
    trades is both tractable at any sf and the more meaningful signal
    (shared rare suppliers, not shared commodity ones)."""
    import pyarrow.compute as pc

    def edge_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_quantity"], 2))
        c = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"src": pa.array(c * 2, pa.int64()),
                         "dst": pa.array(s * 2 + 1, pa.int64())})

    return _trade_pair_edges(sf_dir, edge_rows, with_quantity=True,
                             n_parts=16) \
        .map_batches(_bidir, batch_format="pyarrow")


def trade_link_prediction(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Top-k Adamic–Adar link predictions over the sparse (quantity ≤ 2)
    bidirectional trade graph: which customer pairs (or supplier pairs
    — the graph is bipartite, so every wedge candidate is same-family)
    share the most rare-trade partners. The oracle re-derives the same
    scores with a wedge self-join + degree CTE over the same filtered
    pair set. n_parts=16: the sparse graph's exchanges are fixed-cost
    bound, not volume-bound (64 parts measured ~2 s slower at sf0.1
    for identical output)."""
    return link_prediction_scores(trade_edges_sparse(sf_dir), k=k,
                                  n_parts=16)


def hyperball(edges_ds, max_t: int = 3, p: int = 12,
              n_parts: int = 16) -> pd.DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function
    N(t) = Σ_v |ball(v, t)| — the count of (source, reachable-within-t)
    pairs, self included — estimated for ALL nodes simultaneously by
    iterating per-node HLL counters against the edge Dataset. N(t)'s
    90% crossing is the standard effective-diameter statistic of a web
    host graph. Returns pandas (t, pairs_est:float64) for t = 1..max_t
    (early-stops when every ball has converged).

    Scale shape: counters live as a (node, regs:binary) Dataset (2^p
    bytes each); per iteration ONE hash_join ships each dst-counter to
    its in-edges' sources, a per-batch register-max partial collapses
    per src, and one salted node-keyed exchange max-merges partials
    WITH the previous counters riding along (self-inclusion and union
    in the same exchange — register-wise max IS HLL union). The driver
    sees per-iteration scalars (the N(t) sums). Per-iteration exchange
    volume is edge-scaled × 2^p bytes — the HyperBall cost model; at
    web scale run p = 6-8 (64-256 B counters, ~4-7% σ), p = 12 here
    so the registry gate can pin a ±5% tolerance."""
    from .join import hash_join
    from .shuffle import salted_partition_apply
    from .sketch import _bucket_ranks, hll_estimate

    m = 1 << p
    edges_ds = edges_ds.materialize()
    if edges_ds.count() == 0:
        return pd.DataFrame({"t": pd.Series(dtype="int64"),
                             "pairs_est": pd.Series(dtype="float64")})

    def uniq(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node"].to_numpy(zero_copy_only=False).astype(np.int64)

    def init_rows(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b, r = _bucket_ranks(node, p)
        regs = np.zeros((node.size, m), np.uint8)
        regs[np.arange(node.size), b] = r
        return pa.table({
            "node": pa.array(node),
            "regs": pa.array([row.tobytes() for row in regs],
                             pa.binary())})

    counters = salted_partition_apply(
        edges_ds.map_batches(uniq, batch_format="pyarrow"),
        lambda df: df.drop_duplicates("node"),
        node_key, n_parts=n_parts) \
        .map_batches(init_rows, batch_format="pyarrow") \
        .repartition(n_parts).materialize()

    def est_sum(ds) -> float:
        def partial(t: pa.Table) -> pa.Table:
            s = sum(hll_estimate(np.frombuffer(b, np.uint8))
                    for b in t["regs"].to_pylist())
            return pa.table({"s": pa.array([float(s)], pa.float64())})
        return float(ds.map_batches(partial, batch_format="pyarrow")
                     .sum("s") or 0.0)

    def max_by_node(nodes_arr: np.ndarray, regs_list) -> tuple:
        """Vectorized register-wise max per node: stack, sort by node,
        maximum.reduceat at group starts."""
        stack = np.stack([np.frombuffer(b, np.uint8)
                          for b in regs_list])
        order = np.argsort(nodes_arr, kind="stable")
        ns, st = nodes_arr[order], stack[order]
        starts = np.nonzero(np.concatenate(
            [[True], ns[1:] != ns[:-1]]))[0]
        return ns[starts], np.maximum.reduceat(st, starts, axis=0)

    out_t, out_est = [], []
    prev = est_sum(counters)
    for t_ in range(1, max_t + 1):
        shipped = hash_join(
            edges_ds,
            _arrow_rename(counters, {"node": "dst"}),
            on="dst", how="inner", n_parts=n_parts)

        def src_partial(tb: pa.Table) -> pa.Table:
            src = tb["src"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if src.size == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "regs": pa.array([], pa.binary())})
            ns, mx = max_by_node(src, tb["regs"].to_pylist())
            return pa.table({
                "node": pa.array(ns, pa.int64()),
                "regs": pa.array([row.tobytes() for row in mx],
                                 pa.binary())})

        def merge_part(df: pd.DataFrame) -> pd.DataFrame:
            ns, mx = max_by_node(
                df["node"].to_numpy().astype(np.int64),
                list(df["regs"]))
            return pd.DataFrame({
                "node": pd.Series(ns, dtype="int64"),
                "regs": [row.tobytes() for row in mx]})

        counters = salted_partition_apply(
            shipped.map_batches(src_partial, batch_format="pyarrow")
            .union(counters),
            merge_part, node_key, n_parts=n_parts) \
            .repartition(n_parts).materialize()
        cur = est_sum(counters)
        out_t.append(t_)
        out_est.append(cur)
        if abs(cur - prev) < 1e-9:        # every ball converged
            break
        prev = cur
    return pd.DataFrame({"t": pd.Series(out_t, dtype="int64"),
                         "pairs_est": pd.Series(out_est,
                                                dtype="float64")})


def _exact_neighborhood_pairs(edges: pd.DataFrame,
                              max_t: int) -> list[int]:
    """Exact N(t) for t = 1..max_t on a DRIVER-COLLECTED edge frame —
    the truth-set recount behind the hyperball registry gate (clearly
    labeled: graph-scaled driver memory, test/gate scales only).
    Packed-bitmap closure: ball(t+1)[v] = ball(t)[v] | OR over
    out-neighbors u of ball(t)[u], via one unbuffered bitwise_or.at
    per round."""
    nodes = np.unique(np.concatenate([
        edges["src"].to_numpy(), edges["dst"].to_numpy()])
        .astype(np.int64))
    n = nodes.size
    si = np.searchsorted(nodes, edges["src"].to_numpy().astype(np.int64))
    di = np.searchsorted(nodes, edges["dst"].to_numpy().astype(np.int64))
    nb = (n + 7) // 8
    ball = np.zeros((n, nb), np.uint8)
    idx = np.arange(n)
    ball[idx, idx >> 3] |= (1 << (idx & 7)).astype(np.uint8)
    popcnt = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                           axis=1).sum(axis=1)
    out = []
    for _ in range(max_t):
        nxt = ball.copy()
        np.bitwise_or.at(nxt, si, ball[di])
        ball = nxt
        out.append(int(popcnt[ball].sum()))
    return out


def trade_edges_cyclic(sf_dir: str):
    """Sparse DIRECTED trade graph with real cycles: cust→supp for
    distinct pairs that ever traded at quantity ≤ 2, supp→cust for
    quantity ≥ 49 (the tail extremes, so the graph is sparse enough
    for non-trivial SCC structure — one big component + a DAG fringe
    at the test scales, re-derived verbatim by the SQL oracle)."""

    def edge_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) * 2
        s = t["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64) * 2 + 1
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        lo = q <= 2
        hi = q >= 49
        return pa.table({
            "src": pa.array(np.concatenate([c[lo], s[hi]]), pa.int64()),
            "dst": pa.array(np.concatenate([s[lo], c[hi]]), pa.int64())})

    return _trade_pair_edges(sf_dir, edge_rows, with_quantity=True)


def trade_scc(sf_dir: str) -> pd.DataFrame:
    """SCC decomposition of the cyclic trade graph; scc_id = max node
    id of the component (coloring root), matching the recursive-CTE
    mutual-reachability oracle re-keyed to the max."""
    return strongly_connected_components(trade_edges_cyclic(sf_dir))


# --- host-level link graph from a pages table --------------------------------


def host_link_edges(pages_ds, url_col: str = "url",
                    html_col: str = "html", n_parts: int = 16):
    """Distinct (src_host, dst_host) edges from the pages table's
    anchor walk (the SAME harvest+absolutize path the anchor-text gate
    pins byte-exact against a DuckDB regexp re-derivation) —
    self-loops dropped. Per-batch distinct combiner where the html
    lives, then ONE salted exchange keyed on the pair hash; html never
    re-ships."""
    from ..functions.dom import fromstring
    from ..functions.extract import harvest_anchors_from_doc
    from .shuffle import salted_partition_apply

    def _host(u: str) -> str:
        parts = u.split("/")
        return parts[2] if len(parts) > 2 and "://" in u else ""

    def harvest(t: pa.Table) -> pa.Table:
        src: list[str] = []
        dst: list[str] = []
        for url, html in zip(t[url_col].to_pylist(),
                             t[html_col].to_pylist()):
            sh = _host(url)
            if not sh:
                continue
            try:
                doc = fromstring(html)
            except Exception:
                continue
            for d, _txt in harvest_anchors_from_doc(doc, url):
                dh = _host(d)
                if dh and dh != sh:
                    src.append(sh)
                    dst.append(dh)
        df = pd.DataFrame({"src_host": src, "dst_host": dst}) \
            .drop_duplicates()
        # explicit string schema: an anchor-free batch would otherwise
        # emit an empty frame Arrow infers as DOUBLE columns, and the
        # downstream exchange dies unifying double vs string blocks
        # (review finding)
        return pa.table({
            "src_host": pa.array(df["src_host"].tolist(), pa.string()),
            "dst_host": pa.array(df["dst_host"].tolist(), pa.string())})

    def pair_key(t: pa.Table) -> np.ndarray:
        a = pd.util.hash_array(
            t["src_host"].to_numpy(zero_copy_only=False))
        b = pd.util.hash_array(
            t["dst_host"].to_numpy(zero_copy_only=False))
        return (a * np.uint64(1000003) + b).view(np.int64)

    return salted_partition_apply(
        pages_ds.map_batches(harvest, batch_format="pyarrow"),
        lambda df: df.drop_duplicates(), pair_key, n_parts=n_parts)


def host_rank_for_docs(pages_ds, damping: float = 0.85, iters: int = 3):
    """Domain-reputation weighting — the webtext curation composition:
    host link graph off the anchor walk → PageRank over hosts (full
    dangling handling; hosts linked-to but never crawled are real
    sinks) → every page annotated with its host's rank. Hosts are
    node-scaled by definition (|hosts| ≪ |pages|), so the id map and
    the rank lookup broadcast; the pages table streams through one
    map_batches for the final annotate. Returns a Dataset of
    (url, host, host_rank)."""
    import ray

    edges = host_link_edges(pages_ds).to_pandas().drop_duplicates()
    hosts = np.unique(np.concatenate(
        [edges["src_host"].to_numpy(), edges["dst_host"].to_numpy()]))
    hid = {h: i for i, h in enumerate(hosts)}
    import ray.data as rd
    eds = rd.from_pandas(pd.DataFrame({
        "src": edges["src_host"].map(hid).astype("int64"),
        "dst": edges["dst_host"].map(hid).astype("int64")}))
    pr = pagerank(eds, damping=damping, iters=iters)
    rank_of = dict(zip(hosts[pr["node_id"].to_numpy()],
                       pr["score"].to_numpy()))
    ref = ray.put(rank_of)

    def annotate(t: pa.Table) -> pa.Table:
        ro = ray.get(ref)
        urls = t["url"].to_pylist()
        hs = [u.split("/")[2] if "://" in u else "" for u in urls]
        rk = [float(ro.get(h, 0.0)) for h in hs]
        return pa.table({"url": t["url"],
                         "host": pa.array(hs, pa.string()),
                         "host_rank": pa.array(rk, pa.float64())})

    # project BEFORE the annotate stage so html never crosses the
    # map boundary a second time (review finding: the in-lambda
    # select still paid the blob deserialization)
    return pages_ds.select_columns(["url"]) \
        .map_batches(annotate, batch_format="pyarrow")


def _arrow_rename(ds, mapping: dict):
    """Rename Dataset columns via an arrow map — the shared workaround
    for Dataset.rename_columns' Project stage rejecting the pandas
    blocks exchanges emit (Ray 2.49); previously re-implemented inline
    at each site (review finding)."""
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [mapping.get(c, c) for c in t.column_names])
    return ds.map_batches(fn, batch_format="pyarrow")


def _lpa_broadcast(edges_ds, labels_ds, iters: int):
    """Small-graph fast path for ``label_propagation`` — same vote
    algebra, different physical plan (the pagerank/HITS two-path
    pattern): labels broadcast once per round via ``ray.put``
    (node-scaled), each edge block emits a pre-aggregated
    (node, label, n) vote partial, and the plurality argmax folds on
    the driver. One streamed pass per round, ZERO exchanges — at the
    gate scales this is ~5× faster than the exchange path, whose 2
    exchanges × iters are pure fixed overhead on small graphs. Driver
    vote volume is bounded by the edge count, which is what the
    ``node_broadcast_limit`` switch guards."""
    import ray
    import ray.data as rd

    lab_df = labels_ds.to_pandas()
    order = np.argsort(lab_df["node"].to_numpy(np.int64))
    nodes = lab_df["node"].to_numpy(np.int64)[order]
    cur = lab_df["label"].to_numpy(np.int64)[order]

    for _ in range(iters):
        ref = ray.put(cur)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            lab = ray.get(_ref)
            src = t["src"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            idx = np.searchsorted(nodes, src)
            np.clip(idx, 0, nodes.size - 1, out=idx)
            # drop votes from nodes outside the label universe (a
            # symmetric-contract violation) instead of silently
            # counting a neighbor's label — matches the exchange
            # path, whose hash_join just drops them (review finding)
            valid = nodes[idx] == src
            voted = lab[idx[valid]]
            df = pd.DataFrame({
                "node": t["dst"].to_numpy(zero_copy_only=False)
                .astype(np.int64)[valid], "label": voted})
            g = df.groupby(["node", "label"], sort=False) \
                .size().reset_index(name="n")
            return pa.Table.from_pandas(g, preserve_index=False)

        parts = edges_ds.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()
        selfv = pd.DataFrame({"node": nodes, "label": cur,
                              "n": np.ones(nodes.size, np.int64)})
        votes = pd.concat([parts, selfv], ignore_index=True) \
            .groupby(["node", "label"], as_index=False)["n"].sum()
        votes = votes.sort_values(["node", "n", "label"],
                                  ascending=[True, False, True],
                                  kind="mergesort") \
            .drop_duplicates("node").sort_values("node")
        # every node self-votes, so `votes` covers the node universe
        cur = votes["label"].to_numpy(np.int64)

    return rd.from_pandas(pd.DataFrame({"node": nodes, "label": cur}))


def label_propagation(edges_ds, iters: int = 4,
                      n_parts: int = 64,
                      node_broadcast_limit: int = 500_000):
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made deterministic: every node votes its CURRENT
    label for itself and for each neighbor, and each node adopts the
    plurality label with the tie-break (count desc, label asc). The
    self-vote keeps singleton-phase ties anchored, so dense groups
    converge to their min node id while sparse bridges heal back (a
    leaked label loses the plurality vote on the next round) — unlike
    min-label propagation, which IS connected components and floods
    through every bridge.

    ``edges_ds`` must be SYMMETRIC (src, dst) int64 — the same contract
    as `pagerank`. Fixed ``iters`` synchronous rounds (the planted-gate
    suite converges in 2; the deterministic rule cannot oscillate once
    votes are stable, and fixed rounds keep the oracle re-derivable).

    Scale shape: per round, one hash_join ships each node's label to
    its out-edges (edge-scaled, key-functional), then one salted
    exchange keyed on dst counts votes and takes the argmax where the
    node lives — the driver never sees anything node- or edge-scaled.
    Below ``node_broadcast_limit`` nodes the same algebra runs as the
    ``_lpa_broadcast`` fast path (labels via ray.put, zero exchanges,
    driver argmax) — the pagerank/HITS two-path switch, parity-pinned
    in tests. Returns a Dataset (node, label)."""
    from .join import hash_join
    from .shuffle import salted_partition_apply

    edges_ds = edges_ds.materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        u = np.unique(t["dst"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"node": pa.array(u, pa.int64()),
                         "label": pa.array(u, pa.int64())})

    # symmetric edges => dst alone covers every node; distinct via one
    # salted exchange (node-scaled, never on the driver)
    labels = salted_partition_apply(
        edges_ds.map_batches(init_labels, batch_format="pyarrow"),
        lambda df: df.drop_duplicates("node"),
        combine_key=lambda t: t["node"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=min(n_parts, 16)).materialize()

    if labels.count() <= node_broadcast_limit:
        return _lpa_broadcast(edges_ds, labels, iters)

    def vote_argmax(df: pd.DataFrame) -> pd.DataFrame:
        votes = df.groupby(["node", "label"], sort=False) \
            .size().reset_index(name="n")
        votes = votes.sort_values(["node", "n", "label"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
        return votes.drop_duplicates("node")[["node", "label"]]

    _ren = _arrow_rename

    for _ in range(iters):
        shipped = _ren(
            hash_join(edges_ds, _ren(labels, {"node": "src"}),
                      on="src", n_parts=n_parts),
            {"dst": "node"}).select_columns(["node", "label"])
        ballots = shipped.union(_ren(labels, {}))  # arrow-normalized
        labels = salted_partition_apply(
            ballots, vote_argmax,
            combine_key=lambda t: t["node"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            n_parts=n_parts).materialize()
    return labels


def _sssp_broadcast(edges_ds, src_ids: np.ndarray,
                    max_hops: int) -> pd.DataFrame:
    """Small-graph fast path for ``shortest_paths`` — same relaxation
    algebra, zero exchanges (the pagerank/HITS/LPA two-path pattern):
    the distance vector broadcasts via ``ray.put`` each round, every
    edge block emits a pre-minimized (node, cand_dist) partial, and the
    driver folds the min. Per-round driver volume is bounded by
    nodes × blocks after the per-block min — what the node-count switch
    guards."""
    import ray

    def node_partial(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [t["src"].to_numpy(zero_copy_only=False),
             t["dst"].to_numpy(zero_copy_only=False)]).astype(np.int64))
        return pa.table({"node": pa.array(u, pa.int64())})

    nodes = np.unique(np.concatenate([
        edges_ds.map_batches(node_partial, batch_format="pyarrow")
        .to_pandas()["node"].to_numpy(np.int64),
        src_ids]))  # an edge-less source still gets its dist-0 row
    INF = np.int64(np.iinfo(np.int64).max // 4)
    dist = np.full(nodes.size, INF, np.int64)
    dist[np.searchsorted(nodes, src_ids)] = 0

    for _ in range(max_hops):
        dref = ray.put(dist)

        def relax_partial(t: pa.Table, _dref=dref) -> pa.Table:
            d = ray.get(_dref)
            s = t["src"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dd = t["dst"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
            ds_ = d[np.searchsorted(nodes, s)]
            ok = ds_ < INF
            if not ok.any():
                return pa.table({"node": pa.array([], pa.int64()),
                                 "cand": pa.array([], pa.int64())})
            di = np.searchsorted(nodes, dd[ok])
            cand = ds_[ok] + w[ok]
            # per-block min per destination before anything ships
            order = np.argsort(di, kind="stable")
            di, cand = di[order], cand[order]
            first = np.ones(di.size, bool)
            first[1:] = di[1:] != di[:-1]
            mins = np.minimum.reduceat(cand, np.nonzero(first)[0])
            return pa.table({
                "node": pa.array(nodes[di[first]], pa.int64()),
                "cand": pa.array(mins, pa.int64())})

        parts = edges_ds.map_batches(relax_partial,
                                     batch_format="pyarrow") \
            .to_pandas()
        if len(parts):
            idx = np.searchsorted(nodes, parts["node"].to_numpy(np.int64))
            np.minimum.at(dist, idx, parts["cand"].to_numpy(np.int64))

    keep = dist < INF
    return pd.DataFrame({"node_id": nodes[keep],
                         "dist": dist[keep]}) \
        .sort_values("node_id").reset_index(drop=True)


def shortest_paths(edges_ds, sources: list[int], max_hops: int = 3,
                   n_parts: int = 32,
                   node_broadcast_limit: int = 500_000) -> pd.DataFrame:
    """Bounded-hop weighted shortest paths (Bellman–Ford relaxation
    rounds) over a weighted edge Dataset (src:int64, dst:int64,
    w:int64): dist(v) = MIN total weight over paths of ≤ ``max_hops``
    edges from any source (sources at 0). The cost-aware sibling of
    ``bfs_hops`` — crawl-budget routing and host-proximity features
    where edges carry latency/politeness cost rather than unit hops.

    Scale shape: the distance table stays a DATASET; per round ONE
    hash_join ships current distances onto out-edges (exchange keyed on
    src) and ONE salted min-reduce re-keys candidates ∪ previous by
    node — the edge set never concentrates anywhere, and with integer
    weights the min-fold is exact (no float summation-order noise).
    Materialized once per round so round r's lineage doesn't re-run
    rounds 0..r-1 twice (dist feeds both the join and the union).
    Below ``node_broadcast_limit`` nodes the same algebra runs as
    ``_sssp_broadcast`` (distance vector via ray.put, per-block
    pre-minimized partials, zero exchanges) — the pagerank/HITS/LPA
    two-path switch, parity-pinned in the unit test."""
    import ray.data as rd

    from .join import hash_join
    from .shuffle import salted_partition_apply

    src_ids = np.unique(np.asarray(sources, dtype=np.int64))
    if src_ids.size == 0:
        raise ValueError("shortest_paths needs at least one source")
    edges_ds = edges_ds.materialize()

    def count_nodes(t: pa.Table) -> pa.Table:
        # BOTH endpoints: dst alone undercounts src-only nodes on
        # directed graphs (10M-src fan-in would wrongly take the
        # driver-resident broadcast path — review finding); the
        # per-block-unique sum is an overestimate, which errs toward
        # the exchange path, the safe side
        u = np.unique(np.concatenate(
            [t["src"].to_numpy(zero_copy_only=False),
             t["dst"].to_numpy(zero_copy_only=False)]))
        return pa.table({"n": pa.array([u.size], pa.int64())})

    approx_nodes = int(edges_ds.map_batches(
        count_nodes, batch_format="pyarrow").to_pandas()["n"].sum())
    if approx_nodes <= node_broadcast_limit:
        return _sssp_broadcast(edges_ds, src_ids, max_hops)

    dist = rd.from_pandas(pd.DataFrame(
        {"node_id": src_ids,
         "dist": np.zeros(src_ids.size, np.int64)})).materialize()

    def relax(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"node_id": t["dst"],
                         "dist": pa.array(d + w, pa.int64())})

    def node_key(t: pa.Table) -> np.ndarray:
        return t["node_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    def min_per_node(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node_id", as_index=False)["dist"].min()

    def as_src(t: pa.Table) -> pa.Table:
        # arrow-map rename: Dataset.rename_columns' Project stage
        # rejects the pandas blocks the exchange emits (Ray 2.49)
        return pa.table({"src": t["node_id"], "dist": t["dist"]})

    for _ in range(max_hops):
        reached = hash_join(
            edges_ds, dist.map_batches(as_src, batch_format="pyarrow"),
            on="src", n_parts=n_parts)
        cand = reached.map_batches(relax, batch_format="pyarrow")
        dist = salted_partition_apply(
            dist.union(cand), min_per_node, node_key,
            n_parts=n_parts).materialize()

    out = dist.to_pandas()
    out["node_id"] = out["node_id"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values("node_id").reset_index(drop=True)


def trade_weighted_edges(sf_dir: str):
    """The bidirectional trade graph with a deterministic symmetric
    integer weight per edge: w = (src + dst) % 7 + 1 — pure arithmetic
    on the node encoding so the SQL oracle derives the SAME weights
    independently (no shipped lookup to trust)."""
    edges = trade_edges(sf_dir)

    def weigh(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": t["src"], "dst": t["dst"],
                         "w": pa.array((s + d) % 7 + 1, pa.int64())})

    return edges.map_batches(weigh, batch_format="pyarrow")


def trade_shortest_paths(sf_dir: str, max_hops: int = 3) -> pd.DataFrame:
    """Min-cost distances over the weighted trade graph from the two
    smallest node ids (same deterministic seed pick as ``trade_bfs``).
    With weights in 1..7 the 3-hop min-COST route often differs from
    the 1-hop route BFS would report — the oracle's chained per-round
    min-relaxation CTEs check exactly that."""
    edges = trade_weighted_edges(sf_dir).materialize()

    def min2(t: pa.Table) -> pa.Table:
        s = np.unique(t["src"].to_numpy(zero_copy_only=False))[:2]
        return pa.table({"node_id": pa.array(s, pa.int64())})

    partials = edges.map_batches(min2, batch_format="pyarrow") \
        .to_pandas()["node_id"].to_numpy()
    seeds = np.unique(partials)[:2].tolist()
    return shortest_paths(edges, seeds, max_hops=max_hops)


def _walks_csr(edges_ds):
    """Collect a deduped edge Dataset into CSR arrays (sorted unique
    src, neighbor offsets, dst) — the broadcast form of a graph.
    Edge-scaled on the driver; callers guard with an edge-count
    switch."""
    df = edges_ds.to_pandas()
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    nodes, starts_idx = np.unique(src, return_index=True)
    offsets = np.append(starts_idx, src.size)
    return nodes, offsets, dst


def _walk_hash(walk_id: int, step: int, dst: np.ndarray) -> np.ndarray:
    """md5_number_lower(walk#step#dst) per candidate — bit-compatible
    with DuckDB (little-endian LAST 8 digest bytes), so the oracle's
    max_by re-derives every step."""
    import hashlib

    out = np.empty(dst.size, np.uint64)
    prefix = f"{walk_id}#{step}#".encode()
    for j in range(dst.size):
        d = hashlib.md5(prefix + str(dst[j]).encode()).digest()
        out[j] = int.from_bytes(d[8:], "little")
    return out


def walk_corpus(edges_ds, starts_ds, walk_len: int = 3,
                edge_broadcast_limit: int = 5_000_000,
                n_parts: int = 32) -> pd.DataFrame:
    """Deterministic 'random'-walk corpus over a deduped edge Dataset —
    the node2vec/DeepWalk input generator, RNG-free so it is resumable
    and SQL-checkable: from each start node one walk of ``walk_len``
    steps, where step s of walk w moves to the out-neighbor d
    maximizing md5(w#s#d) — a hash-rank choice that is uniform over
    neighbors yet reproducible anywhere (the same
    Efraimidis-Spirakis-style trick as `weighted_sample_topk`). A walk
    ends early at a dead-end node. Returns (walk_id, step, node) rows,
    step 0 = the start.

    Two physical paths (the pagerank/LPA switch): under
    ``edge_broadcast_limit`` edges the graph broadcasts once as CSR
    arrays and each WALK block advances all its walks locally per step
    (walks are the data-parallel axis; zero exchanges). Above it, each
    step ships the frontier through one hash_join on src and one
    walk-keyed salted argmax exchange — nothing edge-scaled on the
    driver. Path parity is pinned in pytest with a forced-zero limit."""
    import ray

    from .join import adaptive_join
    from .shuffle import salted_partition_apply

    # global distinct on walk ids FIRST: duplicate starts would make
    # the two physical paths diverge (CSR loops per row, the exchange
    # argmax collapses per walk_id — review finding)
    def start_ids(t: pa.Table) -> pa.Table:
        u = np.unique(t["walk_id"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({"walk_id": pa.array(u, pa.int64())})

    starts_ds = salted_partition_apply(
        starts_ds.map_batches(start_ids, batch_format="pyarrow"),
        lambda df: df.drop_duplicates("walk_id"),
        combine_key=lambda t: t["walk_id"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=min(n_parts, 16))

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= edge_broadcast_limit:
        csr = ray.put(_walks_csr(edges_ds))

        def advance(t: pa.Table) -> pa.Table:
            nodes, offsets, dst = ray.get(csr)
            walks = t["walk_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            out_w, out_s, out_n = [], [], []
            for w in walks:
                cur = w
                out_w.append(w); out_s.append(0); out_n.append(cur)
                for s in range(1, walk_len + 1):
                    i = int(np.searchsorted(nodes, cur))
                    if i >= nodes.size or nodes[i] != cur:
                        break               # dead end
                    nb = dst[offsets[i]:offsets[i + 1]]
                    hv = _walk_hash(int(w), s, nb)
                    cur = int(nb[int(np.argmax(hv))])
                    out_w.append(w); out_s.append(s); out_n.append(cur)
            return pa.table({
                "walk_id": pa.array(np.asarray(out_w, np.int64)),
                "step": pa.array(np.asarray(out_s, np.int64)),
                "node": pa.array(np.asarray(out_n, np.int64))})

        out = starts_ds.map_batches(advance, batch_format="pyarrow") \
            .to_pandas()
        return out.sort_values(["walk_id", "step"]) \
            .reset_index(drop=True)

    # exchange path: frontier through hash_join + walk-keyed argmax
    def as_frontier(t: pa.Table) -> pa.Table:
        return pa.table({"walk_id": t["walk_id"],
                         "src": t["walk_id"]})

    frontier = starts_ds.map_batches(as_frontier,
                                     batch_format="pyarrow")
    rows = [starts_ds.map_batches(
        lambda t: pa.table({
            "walk_id": t["walk_id"],
            "step": pa.array(np.zeros(len(t), np.int64)),
            "node": t["walk_id"]}),
        batch_format="pyarrow").to_pandas()]

    for s in range(1, walk_len + 1):
        # frontier is walk-scaled (≪ edges): adaptive_join broadcasts
        # it and STREAMS the edge side — reshuffling all |E| rows
        # through a hash_join exchange per step was the review finding
        cand = adaptive_join(edges_ds, frontier, on="src",
                             n_parts=n_parts)

        def pick(df: pd.DataFrame, _s=s) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"walk_id": [], "src": []}) \
                    .astype({"walk_id": "int64", "src": "int64"})
            parts = []
            for w, g in df.groupby("walk_id", sort=False):
                nb = g["dst"].to_numpy(np.int64)
                hv = _walk_hash(int(w), _s, nb)
                parts.append((w, int(nb[int(np.argmax(hv))])))
            return pd.DataFrame(parts, columns=["walk_id", "src"])

        frontier = salted_partition_apply(
            cand, pick,
            combine_key=lambda t: t["walk_id"].to_numpy(
                zero_copy_only=False).astype(np.int64),
            n_parts=n_parts).materialize()
        step_df = frontier.to_pandas()
        if step_df.empty:
            break
        rows.append(pd.DataFrame({
            "walk_id": step_df["walk_id"].astype("int64"),
            "step": np.int64(s),
            "node": step_df["src"].astype("int64")}))

    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["walk_id", "step"]).reset_index(drop=True)


def trade_walk_corpus(sf_dir: str, walk_len: int = 3,
                      **kw) -> pd.DataFrame:
    """Walks from every 10th customer node over the bidirectional trade
    graph (walk_id = the start node id — unique by construction)."""
    import ray.data as rd

    edges = trade_edges(sf_dir).materialize()   # starts + walks share it

    def starts_of(t: pa.Table) -> pa.Table:
        s = np.unique(t["src"].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        s = s[(s % 2 == 0) & ((s // 2) % 10 == 0)]   # every 10th cust
        return pa.table({"walk_id": pa.array(s, pa.int64())})

    starts = np.unique(
        edges.map_batches(starts_of, batch_format="pyarrow")
        .to_pandas()["walk_id"].to_numpy(np.int64))
    starts_ds = rd.from_pandas(pd.DataFrame({"walk_id": starts}))
    return walk_corpus(edges, starts_ds, walk_len=walk_len, **kw)
