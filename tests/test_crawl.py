"""Crawl pipeline: engine (Ray Data) vs the sequential reference-semantics
simulator — seen set, per-round fetch sets, golden text, and kill+resume
(SURVEY.md §5 items 3-4)."""

import glob
import os
import shutil

import numpy as np
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from stimson_web_scraper_ray.config import EngineConfig
from stimson_web_scraper_ray.pipelines.crawl import crawl, final_seen_hashes
from stimson_web_scraper_ray.pipelines.sim import simulate_crawl
from stimson_web_scraper_ray.sources.pages import pages_path_for, seed_urls

CFG = EngineConfig(per_host_budget=30, round_budget=500, seen_shards=4,
                   extract_concurrency=2, fetch_concurrency=2)


@pytest.fixture(scope="module")
def pages_path():
    return pages_path_for("/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def seeds(pages_path):
    return seed_urls(pages_path)


@pytest.fixture(scope="module")
def sim_result(pages_path, seeds):
    return simulate_crawl(pages_path, seeds, CFG, max_rounds=3)


@pytest.fixture(scope="module")
def engine_result(ray_session, pages_path, seeds, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("crawl"))
    res = crawl(pages_path, seeds, CFG, out_dir=out, max_rounds=3)
    return res, out


def _round_urls(articles_dir):
    rounds = {}
    for rdir in sorted(glob.glob(os.path.join(articles_dir, "round=*"))):
        rnd = int(rdir.split("=")[-1])
        t = pads.dataset(rdir).to_table(columns=["url"])
        rounds[rnd] = set(t["url"].to_pylist())
    return rounds


def test_crawl_matches_simulator_rounds(engine_result, sim_result):
    res, _ = engine_result
    engine_rounds = _round_urls(res.articles_path)
    sim_rounds = sim_result.groupby("round")["url"].apply(set).to_dict()
    assert set(engine_rounds) == set(sim_rounds)
    for rnd in sim_rounds:
        assert engine_rounds[rnd] == sim_rounds[rnd], f"round {rnd} differs"


def test_final_seen_set_matches_simulator(engine_result, sim_result, seeds):
    res, _ = engine_result
    last = max(int(d.split("=")[-1]) for d in
               glob.glob(os.path.join(res.checkpoint_dir, "round=*")))
    engine_seen = final_seen_hashes(res.checkpoint_dir, last, CFG.seen_shards)
    # sim seen = all attempted budget hashes; fetched ⊆ attempted.
    # engine_seen comes from shard snapshots → compare to sim attempted set
    sim_seen = np.sort(sim_result["url_hash"].to_numpy().astype(np.uint64))
    # attempted ⊇ fetched: every fetched hash must be in the engine seen set
    assert np.isin(sim_seen, engine_seen).all()
    assert res.seen_size == len(engine_seen)


def test_extracted_text_is_byte_identical_to_golden(engine_result, pages_path):
    res, _ = engine_result
    arts = pads.dataset(res.articles_path).to_table(
        columns=["url", "text", "status"])
    golden = pads.dataset(pages_path).to_table(columns=["url", "text"])
    gold = dict(zip(golden["url"].to_pylist(), golden["text"].to_pylist()))
    assert arts.num_rows > 50
    # most pages (incl. non-en) must extract real text, not just '' == ''
    nonempty = sum(1 for txt in arts["text"].to_pylist() if txt)
    assert nonempty / arts.num_rows > 0.8, f"only {nonempty} non-empty texts"
    mismatches = []
    for u, txt, st in zip(arts["url"].to_pylist(), arts["text"].to_pylist(),
                          arts["status"].to_pylist()):
        assert st == "ok"
        if txt != gold[u]:
            mismatches.append(u)
    assert not mismatches, f"{len(mismatches)} text mismatches: {mismatches[:3]}"


def test_metrics_lineage_written(engine_result):
    res, _ = engine_result
    mfiles = glob.glob(os.path.join(res.checkpoint_dir, "round=*/metrics.parquet"))
    assert mfiles
    t = pads.dataset(mfiles).to_table()
    assert {"round", "host", "planned"} <= set(t.column_names)
    assert t.num_rows > 0


def test_parallelism_invariance(ray_session, pages_path, seeds,
                                engine_result, tmp_path_factory):
    """Same crawl with different shard count / pool sizes / budget split
    must fetch identical per-round sets (ordering invariant, SURVEY §2.9)."""
    cfg2 = EngineConfig(per_host_budget=30, round_budget=500, seen_shards=7,
                        extract_concurrency=3, fetch_concurrency=1,
                        extract_batch_size=16)
    out = str(tmp_path_factory.mktemp("crawl_alt"))
    res2 = crawl(pages_path, seeds, cfg2, out_dir=out, max_rounds=3)
    res1, _ = engine_result
    assert _round_urls(res1.articles_path) == _round_urls(res2.articles_path)


def test_kill_and_resume_reproduces_full_run(ray_session, pages_path, seeds,
                                             engine_result, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("crawl_resume"))
    # "kill" after round 0: run only 1 round...
    crawl(pages_path, seeds, CFG, out_dir=out2, max_rounds=1)
    # ...then resume to 3
    res2 = crawl(pages_path, seeds, CFG, out_dir=out2, max_rounds=3,
                 resume=True)
    res_full, _ = engine_result
    full_rounds = _round_urls(res_full.articles_path)
    resumed_rounds = _round_urls(res2.articles_path)
    assert full_rounds == resumed_rounds
    last = max(int(d.split("=")[-1]) for d in
               glob.glob(os.path.join(res2.checkpoint_dir, "round=*")))
    assert np.array_equal(
        final_seen_hashes(res2.checkpoint_dir, last, CFG.seen_shards),
        final_seen_hashes(res_full.checkpoint_dir, last, CFG.seen_shards))


def test_distributed_planning_parity(ray_session, pages_path, seeds,
                                     tmp_path_factory):
    """cfg.distributed_planning routes candidate dedup, seen filtering,
    frontier construction and budget selection through Ray Data (salted
    partitions + checkpoint-parquet frontier). A tiny round_budget forces
    real deferral through the distributed anti-join; the run must match
    the driver-pandas path (and hence the simulator) round for round."""
    import dataclasses

    cfg_p = dataclasses.replace(CFG, round_budget=60,
                                distributed_planning=False)
    # planning_table_limit=0 forces the distributed machinery even at
    # sandbox scale (the default fast path would plan on the driver)
    cfg_d = dataclasses.replace(CFG, round_budget=60,
                                distributed_planning=True,
                                planning_table_limit=0)
    out_p = str(tmp_path_factory.mktemp("crawl_pandas_small"))
    out_d = str(tmp_path_factory.mktemp("crawl_dist_small"))
    res_p = crawl(pages_path, seeds, cfg_p, out_dir=out_p, max_rounds=3)
    res_d = crawl(pages_path, seeds, cfg_d, out_dir=out_d, max_rounds=3)

    assert res_p.pages_fetched == res_d.pages_fetched
    assert _round_urls(res_p.articles_path) == _round_urls(res_d.articles_path)
    seen_p = final_seen_hashes(res_p.checkpoint_dir, 2, cfg_p.seen_shards)
    seen_d = final_seen_hashes(res_d.checkpoint_dir, 2, cfg_d.seen_shards)
    assert np.array_equal(seen_p, seen_d)


def test_dynamic_dispatch_parity(ray_session, pages_path, seeds,
                                 tmp_path_factory):
    """cfg.dynamic_dispatch replaces sticky LPT pinning with late-binding
    work-unit dispatch (legal at politeness_delay_s == 0). Unit
    boundaries must not change WHAT is crawled: rounds and final seen
    set identical to the pinned path (and hence the simulator)."""
    import dataclasses

    cfg_s = dataclasses.replace(CFG, round_budget=60)
    cfg_d = dataclasses.replace(CFG, round_budget=60,
                                dynamic_dispatch=True)
    out_s = str(tmp_path_factory.mktemp("crawl_sticky"))
    out_d = str(tmp_path_factory.mktemp("crawl_dyn"))
    res_s = crawl(pages_path, seeds, cfg_s, out_dir=out_s, max_rounds=3)
    res_d = crawl(pages_path, seeds, cfg_d, out_dir=out_d, max_rounds=3)
    assert res_s.pages_fetched == res_d.pages_fetched
    assert _round_urls(res_s.articles_path) == _round_urls(res_d.articles_path)
    seen_s = final_seen_hashes(res_s.checkpoint_dir, 2, CFG.seen_shards)
    seen_d = final_seen_hashes(res_d.checkpoint_dir, 2, CFG.seen_shards)
    assert np.array_equal(seen_s, seen_d)


def test_tail_holdback_parity(ray_session, pages_path, seeds,
                              tmp_path_factory):
    """Hybrid sticky-head + late-binding-tail dispatch
    (cfg.tail_holdback_frac, the default path at politeness_delay_s == 0):
    a forced-heavy tail (frac 0.5, every actor donating half its rows as
    stealable units) must crawl the identical rounds and seen set as pure
    sticky LPT (frac 0.0). Placement is a pure execution decision."""
    import dataclasses

    cfg_off = dataclasses.replace(CFG, round_budget=60,
                                  tail_holdback_frac=0.0)
    cfg_on = dataclasses.replace(CFG, round_budget=60,
                                 tail_holdback_frac=0.5,
                                 extract_concurrency=4)
    out_off = str(tmp_path_factory.mktemp("crawl_notail"))
    out_on = str(tmp_path_factory.mktemp("crawl_tail"))
    res_off = crawl(pages_path, seeds, cfg_off, out_dir=out_off,
                    max_rounds=3)
    res_on = crawl(pages_path, seeds, cfg_on, out_dir=out_on, max_rounds=3)
    assert res_off.pages_fetched == res_on.pages_fetched
    assert _round_urls(res_off.articles_path) == \
        _round_urls(res_on.articles_path)
    seen_off = final_seen_hashes(res_off.checkpoint_dir, 2, CFG.seen_shards)
    seen_on = final_seen_hashes(res_on.checkpoint_dir, 2, CFG.seen_shards)
    assert np.array_equal(seen_off, seen_on)


def test_flagship_config_matches_simulator(ray_session, pages_path, seeds,
                                           tmp_path_factory):
    """entry()'s EXACT configuration (per_host_budget=40,
    round_budget=2000, planning_table_limit=0 forcing distributed
    planning, 3 rounds) against the simulator — the driver window's two
    rows-only flagships (crawl_flagship, web_train_set) are gated by
    crawl_parity's shared 2-round config; this pins the flagship's own
    config to the same per-round fetch-set + seen-superset invariant."""
    cfg = EngineConfig(per_host_budget=40, round_budget=2000,
                       seen_shards=4, extract_concurrency=4,
                       fetch_concurrency=2, planning_table_limit=0)
    out = str(tmp_path_factory.mktemp("crawl_flagship_cfg"))
    res = crawl(pages_path, seeds, cfg, out_dir=out, max_rounds=3)
    sim = simulate_crawl(pages_path, seeds, cfg, max_rounds=3)

    engine_rounds = _round_urls(res.articles_path)
    sim_rounds = sim.groupby("round")["url"].apply(set).to_dict()
    assert set(engine_rounds) == set(sim_rounds)
    for rnd in sim_rounds:
        assert engine_rounds[rnd] == sim_rounds[rnd], f"round {rnd} differs"
    last = max(engine_rounds)
    eng_seen = final_seen_hashes(res.checkpoint_dir, last, cfg.seen_shards)
    sim_seen = np.sort(sim["url_hash"].to_numpy().astype(np.uint64))
    assert np.isin(sim_seen, eng_seen).all()


def test_indegree_priority_matches_simulator(ray_session, pages_path,
                                             tmp_path_factory):
    """Citation-count frontier priority (indegree_priority): the engine
    must match the simulator round for round on BOTH planning paths, and
    the signal must actually change the crawl vs the flag-off policy
    (non-vacuous: some candidates are cited more than once)."""
    seeds_l = seed_urls(pages_path)[:8]
    base_kw = dict(per_host_budget=8, round_budget=60, seen_shards=4,
                   extract_concurrency=2, fetch_concurrency=2)
    cfg_on = EngineConfig(indegree_priority=True, **base_kw)
    cfg_off = EngineConfig(**base_kw)

    sim_on = simulate_crawl(pages_path, seeds_l, cfg_on, max_rounds=3)
    sim_off = simulate_crawl(pages_path, seeds_l, cfg_off, max_rounds=3)
    on_rounds = sim_on.groupby("round")["url"].apply(set).to_dict()
    off_rounds = sim_off.groupby("round")["url"].apply(set).to_dict()
    assert any(on_rounds[r] != off_rounds.get(r, set())
               for r in on_rounds), "indegree signal changed nothing"

    for dist in (False, True):
        cfg = EngineConfig(indegree_priority=True,
                           distributed_planning=dist,
                           planning_table_limit=0 if dist else 200_000,
                           **base_kw)
        out = str(tmp_path_factory.mktemp(f"crawl_indeg_{dist}"))
        res = crawl(pages_path, seeds_l, cfg, out_dir=out, max_rounds=3)
        engine_rounds = _round_urls(res.articles_path)
        assert set(engine_rounds) == set(on_rounds)
        for rnd in on_rounds:
            assert engine_rounds[rnd] == on_rounds[rnd], \
                f"dist={dist} round {rnd} differs"


def test_indegree_priority_survives_resume(ray_session, pages_path,
                                           tmp_path_factory):
    """Count-based priorities ride the frontier checkpoint: killing after
    round 0 and resuming must reproduce the uninterrupted indegree run
    exactly (rounds and final seen set)."""
    seeds_l = seed_urls(pages_path)[:8]
    cfg = EngineConfig(indegree_priority=True, per_host_budget=8,
                       round_budget=60, seen_shards=4,
                       extract_concurrency=2, fetch_concurrency=2)
    out_full = str(tmp_path_factory.mktemp("crawl_indeg_full"))
    res_full = crawl(pages_path, seeds_l, cfg, out_dir=out_full,
                     max_rounds=3)
    out2 = str(tmp_path_factory.mktemp("crawl_indeg_resume"))
    crawl(pages_path, seeds_l, cfg, out_dir=out2, max_rounds=1)
    res2 = crawl(pages_path, seeds_l, cfg, out_dir=out2, max_rounds=3,
                 resume=True)
    assert _round_urls(res_full.articles_path) == \
        _round_urls(res2.articles_path)
    last = max(int(d.split("=")[-1]) for d in
               glob.glob(os.path.join(res2.checkpoint_dir, "round=*")))
    assert np.array_equal(
        final_seen_hashes(res2.checkpoint_dir, last, cfg.seen_shards),
        final_seen_hashes(res_full.checkpoint_dir, last, cfg.seen_shards))


def test_empty_seed_list_is_graceful(ray_session, pages_path,
                                     tmp_path_factory):
    """Zero seeds (or seeds that all fail valid_url) must produce a
    clean empty crawl on both engine and simulator — no exception, no
    round dirs, zero pages."""
    out = str(tmp_path_factory.mktemp("crawl_empty"))
    res = crawl(pages_path, [], CFG, out_dir=out, max_rounds=3)
    assert res.pages_fetched == 0
    assert _round_urls(res.articles_path) == {}
    sim = simulate_crawl(pages_path, [], CFG, max_rounds=3)
    assert len(sim) == 0


def test_warm_pool_parity(ray_session, pages_path, seeds, tmp_path_factory):
    """warm_pool=True (steady-state benchmark mode: spawn barrier before
    round 0) is pure timing instrumentation — identical rounds, seen
    set, and a positive setup_sec report."""
    out = str(tmp_path_factory.mktemp("crawl_warm"))
    res_w = crawl(pages_path, seeds, CFG, out_dir=out, max_rounds=3,
                  warm_pool=True)
    out_c = str(tmp_path_factory.mktemp("crawl_cold"))
    res_c = crawl(pages_path, seeds, CFG, out_dir=out_c, max_rounds=3)
    assert res_w.pages_fetched == res_c.pages_fetched
    assert _round_urls(res_w.articles_path) == _round_urls(res_c.articles_path)
    assert res_w.setup_sec > 0
