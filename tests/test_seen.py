"""Seen-set shard unit tests: cuckoo no-false-negatives, FP confirmation,
snapshot/restore round-trip (SURVEY.md §7 step 4)."""

import numpy as np

from stimson_web_scraper_ray.state.seen import CuckooFilter, SeenShard, route


def test_cuckoo_no_false_negatives():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    f = CuckooFilter(capacity=8192)
    f.insert(keys)
    assert f.contains(keys).all()


def test_cuckoo_fp_rate_reasonable():
    rng = np.random.default_rng(8)
    keys = rng.integers(0, 2**64, size=5000, dtype=np.uint64)
    other = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    other = np.setdiff1d(other, keys)
    f = CuckooFilter(capacity=8192)
    f.insert(keys)
    fp = f.contains(other).mean()
    assert fp < 0.02, fp  # 16-bit fingerprints, 4 slots → ~2*4/2^16 ≈ 0.012%


def test_shard_check_and_insert_first_wins():
    s = SeenShard(0, capacity=1024)
    h = np.array([1, 2, 3, 2, 1], dtype=np.uint64)
    mask = s.check_and_insert(h)
    assert mask.tolist() == [True, True, True, False, False]
    mask2 = s.check_and_insert(np.array([3, 4], dtype=np.uint64))
    assert mask2.tolist() == [False, True]
    assert s.size() == 4


def test_shard_snapshot_restore(tmp_path):
    s = SeenShard(0, capacity=1024)
    keys = np.arange(100, 600, dtype=np.uint64)
    s.insert(keys)
    p = str(tmp_path / "snap.parquet")
    s.snapshot(p)
    s2 = SeenShard(0)
    s2.restore(p)
    assert s2.size() == 500
    assert s2.check(np.array([100, 599, 9999], dtype=np.uint64)).tolist() == \
        [True, True, False]
    # cuckoo rebuilt: membership still correct after restore
    assert s2.check_and_insert(np.array([100, 777], dtype=np.uint64)).tolist() == \
        [False, True]


def test_route_deterministic():
    h = np.array([0, 1, 15, 16, 2**63], dtype=np.uint64)
    r = route(h, 8)
    assert r.tolist() == [(int(x) % 8) for x in h]
