"""Single-process crawl simulator — the ordering/seen-set oracle.

Sequential reimplementation of the crawl semantics (SURVEY.md §5 test plan:
"compare final seen-set and crawl order against a single-process
reference-semantics simulator"). Shares the *planning algebra*
(_plan_round, urlnorm, outlink harvest) with the engine but executes with
plain dicts — no Ray. The engine's distributed execution must produce the
identical fetched-url sequence (round, rank_in_round) and identical final
seen set at any parallelism level and across kill+resume.
"""

from __future__ import annotations

import pandas as pd

import numpy as np
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..functions import dom, metadata
from ..functions.urlnorm import canon_hash64, get_domain, prepare_url, valid_url
from ..stages.extract_stage import harvest_outlinks
from .crawl import _frontier_from_seeds, _plan_round


def simulate_crawl(pages_path: str, seeds: list[str],
                   cfg: EngineConfig | None = None,
                   max_rounds: int = 3) -> pd.DataFrame:
    """Returns the expected_crawl table (FIXTURES.md §4): one row per
    fetched url with (url, url_hash, round, rank_in_round, host)."""
    cfg = cfg or EngineConfig()
    import pyarrow.dataset as pads

    pages = pads.dataset(pages_path, format="parquet").to_table(
        columns=["url", "html"])
    web = {u: h for u, h in zip(pages["url"].to_pylist(),
                                pages["html"].to_pylist())}

    from ..stages.fetch import RobotsPolicy

    seen: set[int] = set()
    rows = []
    robots = RobotsPolicy()
    frontier = _frontier_from_seeds(seeds)
    for rnd in range(max_rounds):
        if frontier.empty:
            break
        budget, deferred = _plan_round(frontier, cfg)
        if budget.empty:
            break
        budget = budget[~budget["url_hash"].isin(seen)].reset_index(drop=True)
        seen.update(budget["url_hash"].tolist())

        candidates: list[str] = []
        redirects: list[str] = []
        rank = 0
        for _, row in budget.iterrows():
            url = row["url_canon"]
            # robots: THE SAME policy object the engine's fetchers use
            # (real robotparser semantics), not a re-derived rule
            path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
            if not robots.allowed(row["host"], path):
                continue
            html = web.get(url)
            if html is None:
                continue  # 404
            rows.append({"url": url, "url_hash": int(row["url_hash"]),
                         "round": rnd, "rank_in_round": rank,
                         "host": row["host"]})
            rank += 1
            candidates.extend(harvest_outlinks(html, url))
            # canonical rebuild + meta-refresh follow (engine parity)
            doc = dom.fromstring(html)
            canonical = metadata.get_canonical_link(url, doc)
            refresh = metadata.extract_meta_refresh(
                dom.decode_html(html)) or ""
            for target in (canonical, refresh):
                if target and target != url:
                    prepared = prepare_url(target, url)
                    if prepared:
                        redirects.append(prepared)

        # normalize + validate + in-round dedup + anti-join vs seen;
        # with indegree_priority the pre-dedup multiplicity (candidates
        # is per-page-unique, so repeats = distinct citing pages) feeds
        # the priority — identical formula to the engine's two planning
        # paths (crawl.py)
        depth = rnd + 1
        base = 1.0 / (1.0 + depth)
        counts: dict[int, int] = {}
        first_url: dict[int, str] = {}
        for u in candidates:
            if not valid_url(u):
                continue
            h = canon_hash64(u)
            counts[h] = counts.get(h, 0) + 1
            if h not in first_url:
                first_url[h] = u
        nxt_rows = []
        for h, u in first_url.items():
            if h in seen:
                continue
            if cfg.indegree_priority:
                prio = np.float32(base + cfg.indegree_weight
                                  * np.log1p(counts[h]))
            else:
                prio = np.float32(base)
            nxt_rows.append({
                "url_canon": u, "url_hash": np.uint64(h),
                "host": get_domain(u) or "", "depth": np.int32(depth),
                "priority": prio,
            })
        nxt = pd.DataFrame(nxt_rows,
                           columns=["url_canon", "url_hash", "host",
                                    "depth", "priority"])
        if not nxt.empty:
            nxt = nxt.astype({"url_hash": "uint64", "depth": "int32",
                              "priority": "float32"})
        parts = [deferred]
        if redirects:
            rseen = sorted(set(redirects))
            rdf = pd.DataFrame({
                "url_canon": rseen,
                "url_hash": pd.array([canon_hash64(u) for u in rseen],
                                     dtype="uint64"),
                "host": [get_domain(u) or "" for u in rseen],
                "depth": np.int32(depth),
                "priority": np.float32(1.5),
            })
            rdf = rdf[~rdf["url_hash"].isin(seen)]
            parts.append(rdf)
        parts.append(nxt)
        frontier = pd.concat(parts, ignore_index=True)
        if not frontier.empty:
            frontier = frontier.sort_values(
                ["priority", "depth", "url_hash"],
                ascending=[False, True, True], kind="mergesort")
            frontier = frontier.drop_duplicates("url_hash").reset_index(drop=True)
            frontier = frontier[frontier["depth"] <= cfg.max_depth]

    return pd.DataFrame(rows, columns=["url", "url_hash", "round",
                                       "rank_in_round", "host"])
