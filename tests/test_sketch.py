"""Sketch operators: HLL accuracy/merge laws, heavy-hitter exactness."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from stimson_web_scraper_ray.pipelines import sketch


def test_hll_accuracy_across_magnitudes():
    rng = np.random.default_rng(7)
    for true_n in (50, 1_000, 50_000):
        keys = rng.choice(np.arange(true_n * 3, dtype=np.int64),
                          size=true_n, replace=False)
        # duplicates must not change the estimate
        stream = np.concatenate([keys, keys[: true_n // 2]])
        est = sketch.hll_estimate(sketch.hll_registers(stream, p=12))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_union():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1 << 40, size=3000).astype(np.int64)
    b = rng.integers(0, 1 << 40, size=3000).astype(np.int64)
    ra, rb = sketch.hll_registers(a), sketch.hll_registers(b)
    merged = sketch.hll_merge(ra, rb)
    direct = sketch.hll_registers(np.concatenate([a, b]))
    assert np.array_equal(merged, direct)
    # commutative + idempotent
    assert np.array_equal(sketch.hll_merge(rb, ra), merged)
    assert np.array_equal(sketch.hll_merge(merged, merged), merged)


def test_hll_distinct_per_group(ray_session):
    rng = np.random.default_rng(3)
    rows = []
    true = {"a": 2000, "b": 500, "c": 37}
    for g, n in true.items():
        users = rng.choice(np.arange(100_000, dtype=np.int64), size=n,
                           replace=False)
        rows += [{"g": g, "u": int(u)} for u in users]
        rows += [{"g": g, "u": int(u)} for u in users[: n // 3]]  # dups
    rng.shuffle(rows)
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(8)
    out = sketch.hll_distinct_per_group(ds, "g", "u", p=12)
    got = dict(zip(out["g"], out["approx_distinct"]))
    for g, n in true.items():
        assert abs(got[g] - n) / n < 0.06, (g, n, got[g])


def test_hll_pair_overlap_constructed(ray_session):
    """Exact n_common must equal the constructed ground truth (sets
    with known pairwise intersections, values split across blocks so
    the bitmask exchange crosses partitions), estimates must sit inside
    the gate bound, and zero-overlap pairs must still get a row."""
    rng = np.random.default_rng(13)
    pool = rng.choice(np.arange(500_000, dtype=np.int64), size=9_000,
                      replace=False)
    a = pool[:4_000]
    b = np.concatenate([a[:1_500], pool[4_000:6_500]])   # |a∩b| = 1500
    c = np.concatenate([a[:300], pool[6_500:]])           # |a∩c| = 300
    rows = pd.DataFrame({
        "g": (["a"] * len(a)) + (["b"] * len(b)) + (["c"] * len(c)),
        "u": np.concatenate([a, b, c])})
    # duplicates must not change anything
    rows = pd.concat([rows, rows.iloc[:2000]], ignore_index=True)
    ds = rd.from_pandas(rows.sample(frac=1.0, random_state=0)) \
        .repartition(7)
    out = sketch.hll_pair_overlap(ds, "g", "u", p=12)
    got = {(r["group_a"], r["group_b"]): (r["n_common"],
                                          r["within_bound"])
           for _, r in out.iterrows()}
    assert got[("a", "b")][0] == 1_500
    assert got[("a", "c")][0] == 300
    assert got[("b", "c")][0] == 300          # b∩c = a[:300] too
    assert all(v[1] for v in got.values())
    assert len(got) == 3                       # all pairs present


def test_heavy_hitters_exact_on_zipf(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(500)]
    # zipf-ish frequencies → clear heavy hitters
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, size=80, p=probs))
             for _ in range(300)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(6)
    got = sketch.heavy_hitter_words(ds, k=10, k_prime=128)
    # exact truth
    from collections import Counter
    c = Counter(w for t in texts for w in t.split())
    truth = sorted(c.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)[:10]
    assert list(map(tuple, got.itertuples(index=False))) == truth


def test_distributed_cc_matches_pandas(ray_session):
    """resolve_duplicate_groups_distributed == the pandas resolver on
    chains (deep diameter → exercises pointer jumping), stars, random
    unions, and the empty graph, at several partitionings."""
    from stimson_web_scraper_ray.pipelines.dedup import (
        resolve_duplicate_groups,
        resolve_duplicate_groups_distributed,
    )

    rng = np.random.default_rng(21)
    graphs = {
        "chain": [(i + 1, i) for i in range(40)],
        "star": [(100, 100 + i) for i in range(1, 15)],
        "two_comps": [(1, 2), (2, 3), (10, 11), (12, 11), (3, 1)],
        "random": [tuple(sorted(rng.integers(0, 60, size=2).tolist()))
                   for _ in range(80)],
    }
    for name, edges in graphs.items():
        edges = [(a, b) for a, b in edges if a != b]
        df = pd.DataFrame(edges, columns=["a", "b"]).astype("int64")
        want = resolve_duplicate_groups(df)
        for parts in (1, 5):
            ds = rd.from_pandas(df).repartition(parts)
            got = resolve_duplicate_groups_distributed(ds, n_parts=8)
            pd.testing.assert_frame_equal(got, want), name


def test_distributed_cc_empty(ray_session):
    from stimson_web_scraper_ray.pipelines.dedup import (
        resolve_duplicate_groups_distributed)

    ds = rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                      "b": pd.Series(dtype="int64")}))
    out = resolve_duplicate_groups_distributed(ds)
    assert len(out) == 0 and list(out.columns) == ["doc_id", "keep_doc_id"]


def test_profile_table_exact(ray_session):
    """Nulls, -0.0/0.0 equivalence, NaN canonicalization, strings,
    timestamps — exact distinct parity with pandas truth."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.profile import profile_table

    ts = pd.to_datetime(["2026-01-01", "2026-01-01", "2026-01-02", None])
    t = pa.table({
        "i": pa.array([1, 1, 2, None], pa.int64()),
        "f": pa.array([0.0, -0.0, float("nan"), float("nan")],
                      pa.float64()),
        "s": pa.array(["a", "b", "b", None], pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = profile_table(rd.from_arrow(t).repartition(2),
                        ["i", "f", "s", "ts"], n_parts=4)
    got = {r["col"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for _, r in out.iterrows()}
    assert got["i"] == (4, 1, 2)
    assert got["f"] == (4, 0, 2)      # {0.0, nan}: -0.0==0.0, one NaN
    assert got["s"] == (4, 1, 2)
    assert got["ts"] == (4, 1, 2)


def test_heavy_hitters_raises_when_not_provable(ray_session):
    # flat distribution + tiny k': kth count < N/k' must raise, not
    # silently return a maybe-wrong top-k
    rng = np.random.default_rng(9)
    vocab = [f"flat{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab, size=100)) for _ in range(50)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    with pytest.raises(ValueError, match="not provably exact"):
        sketch.heavy_hitter_words(ds, k=10, k_prime=2)
