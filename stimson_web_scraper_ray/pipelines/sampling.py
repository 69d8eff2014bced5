"""Corpus mixing / weighted sampling for training-data assembly.

A pretraining run rarely takes a crawl as-is: sources and languages are
re-weighted (e.g. downsample English boilerplate, upweight code or rare
languages). The operator here is DETERMINISTIC hash sampling — keep a
row iff ``md5(doc_id) mod M < rate·M`` — because at 100 TB resumability
matters more than statistical purity: a re-run (or a retried block)
keeps exactly the same rows, no RNG state is carried across workers,
and the decision is a pure row-local function (no shuffle, no driver).

The hash is md5 of the DECIMAL STRING of the id, little-endian low 64
bits — bit-compatible with DuckDB's ``md5_number_lower(CAST(id AS
VARCHAR))`` so the sampling oracle can verify row membership exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MOD = 10_000


def _keep_hash(ids: list) -> np.ndarray:
    """md5_number_lower(str(id)) % 10000 per id (vector of int64)."""
    out = np.empty(len(ids), dtype=np.int64)
    for i, v in enumerate(ids):
        d = hashlib.md5(str(v).encode("ascii")).digest()
        out[i] = int.from_bytes(d[8:16], "little") % _MOD
    return out


def weighted_sample_batch(batch: pa.Table, rates: dict[str, float],
                          default_rate: float = 1.0,
                          id_col: str = "doc_id",
                          strat_col: str = "lang") -> pa.Table:
    """Keep each row with its stratum's rate, by id-hash threshold."""
    ids = batch[id_col].to_pylist()
    strata = batch[strat_col].to_pylist()
    h = _keep_hash(ids)
    thresh = np.fromiter(
        (int(rates.get(s, default_rate) * _MOD) for s in strata),
        dtype=np.int64, count=len(strata))
    return batch.filter(pa.array(h < thresh))


def weighted_sample(ds, rates: dict[str, float], default_rate: float = 1.0,
                    id_col: str = "doc_id", strat_col: str = "lang"):
    """Dataset wiring: one stateless map_batches, fully streaming."""
    return ds.map_batches(
        lambda b: weighted_sample_batch(b, rates, default_rate,
                                        id_col, strat_col),
        batch_format="pyarrow")


def stratified_sample(ds, k: int, id_col: str = "doc_id",
                      strat_col: str = "lang"):
    """Deterministic per-stratum sample of exactly min(k, |stratum|)
    rows: order within each stratum by md5(str(id)) — a fixed pseudo-
    random permutation any engine can reproduce (SQL: ``row_number()
    OVER (PARTITION BY stratum ORDER BY md5(CAST(id AS VARCHAR)), id)
    <= k``) — and keep the first k. Runs on the grouped_topk primitive:
    one salted exchange keyed on the stratum, vectorized per-part
    selection, no per-stratum dispatch and no global sort."""
    import hashlib

    from .shuffle import grouped_topk

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(str(i).encode()).hexdigest()
              for i in t[id_col].to_pylist()]
        return t.append_column("h", pa.array(hs, pa.string()))

    def strat_key(t: pa.Table) -> np.ndarray:
        import hashlib as _h

        vals = t[strat_col].to_pylist()
        return np.fromiter(
            (int.from_bytes(_h.md5(str(v).encode()).digest()[:8], "little")
             for v in vals), dtype=np.uint64, count=len(vals)) \
            .view(np.int64)

    picked = grouped_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        [strat_col], "h", k, combine_key=strat_key,
        descending=False, tie_cols=[id_col], rank_col="rn")
    return picked.drop_columns(["h"])


def epoch_order(ds, seed: int = 7, k: int = 100, id_col: str = "doc_id"):
    """Deterministic epoch shuffle: global order = rank under
    md5(seed:id) — a reproducible pseudo-random permutation (the
    at-scale substitute for random_shuffle when resumability matters: a
    re-run or a mid-epoch restart recomputes the SAME order from the
    seed, no RNG state). Exercises the engine's native distributed
    range-partitioned sort; only the first ``k`` positions are
    materialized."""
    def add_h(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
              for i in t[id_col].to_pylist()]
        return t.append_column("h", pa.array(hs, pa.string()))

    out = ds.map_batches(add_h, batch_format="pyarrow") \
        .sort(["h", id_col]).limit(k).to_pandas()
    out["pos"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["pos", id_col]]


def weighted_reservoir_topk(ds, k: int = 50, id_col: str = "doc_id",
                            weight_col: str = "n_chars"):
    """Weighted sampling WITHOUT replacement of exactly k rows
    (Efraimidis-Spirakis A-ES): each row draws key = -ln(u)/w with u a
    fixed uniform from its id, and the k SMALLEST keys win — inclusion
    probability proportional to weight, deterministic and resumable
    because u is the engine's md5_number_lower bridge hash, never RNG
    state. Scale shape: one streaming pass emits at most k candidates
    per block (argpartition, no global sort of the corpus), then the
    blocks×k survivors take one tiny sort+limit. Returns pandas
    (id, weight, key rounded 6dp) sorted by id.

    The u = (md5_number_lower(str(id)) + 0.5) / 2^64 form is chosen so
    DuckDB re-derives the identical doubles (the +0.5 also keeps
    u > 0); the SQL oracle is a 3-line window over the same formula."""
    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.empty(len(ids), dtype=np.uint64)
        for i, v in enumerate(ids):
            d = hashlib.md5(str(v).encode("ascii")).digest()
            h[i] = int.from_bytes(d[8:16], "little")
        u = (h.astype(np.float64) + 0.5) / float(1 << 64)
        w = np.asarray(batch[weight_col].to_pylist(), dtype=np.float64)
        key = -np.log(u) / w
        take = min(k, len(ids))
        idx = np.argpartition(key, take - 1)[:take] if take else \
            np.array([], dtype=np.int64)
        return pa.table({
            id_col: pa.array([ids[i] for i in idx]),
            "weight": pa.array(w[idx], pa.float64()),
            "key": pa.array(key[idx], pa.float64()),
        })

    import pandas as pd
    top = ds.map_batches(partial, batch_format="pyarrow") \
        .sort(["key", id_col]).limit(k).to_pandas()
    top["key"] = top["key"].round(6)
    top["weight"] = top["weight"].astype("int64")
    return top.sort_values(id_col).reset_index(drop=True)


def temperature_sample(ds, temperature: float = 2.0, frac: float = 0.5,
                       id_col: str = "doc_id", strat_col: str = "lang"):
    """Temperature-balanced corpus resampling (the multilingual mixing
    rule: target share of stratum l ∝ count_l^(1/T), T>1 flattens the
    distribution toward rare languages). Keep probability per stratum
    p_l = min(1, frac·N·q_l/n_l) with q_l the tempered share; the
    decision stays the repo's deterministic md5-threshold membership
    rule (resumable, row-local, RNG-free), with INTEGER thresholds
    ⌊p_l·10000⌋ so engine and oracle compare the same integers. One
    tiny counts pass feeds the thresholds; the corpus then streams
    through a stateless filter."""
    from ray.data.aggregate import Count

    counts = ds.groupby(strat_col).aggregate(
        Count(alias_name="n")).to_pandas()
    n = counts["n"].to_numpy().astype(np.float64)
    q = n ** (1.0 / temperature)
    q = q / q.sum()
    p = np.minimum(1.0, frac * n.sum() * q / n)
    th = {s: int(np.floor(pv * _MOD))
          for s, pv in zip(counts[strat_col], p)}

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[strat_col].to_pylist()
        h = _keep_hash(ids)
        # default 0 = DROP rows of strata missing from the counts
        # table (e.g. nulls the groupby dropped) — the oracle's inner
        # JOIN drops them too; the old default _MOD kept them all
        # (review finding)
        t = np.fromiter((th.get(s, 0) for s in strata),
                        dtype=np.int64, count=len(strata))
        return batch.filter(pa.array(h < t))

    return ds.map_batches(keep, batch_format="pyarrow")


def coverage_select(ds, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> "pd.DataFrame":
    """Greedy maximum-coverage corpus selection (the classic
    (1-1/e)-approximation): pick ``k`` documents one at a time, each
    maximizing the number of vocabulary words NOT yet covered by the
    picks so far (tie → lower id). The data-selection objective
    complementary to the k-center coreset: coverage of the token space
    rather than spread in embedding space.

    Deterministic and oracle-shared tokenization: lowercase → non
    [a-z0-9] runs to spaces → split (byte-identical to the SQL side's
    regexp_replace + string_split recipe).

    Scale shape: per round the covered vocabulary broadcasts via
    ``ray.put`` (vocabulary-scaled — bounded by corpus vocab, hashable
    to fixed width if that ever outgrew a worker) and ONE streamed pass
    emits a per-block argmax partial (best doc + its uncovered words,
    so the winner's contribution reaches the driver without a second
    pass); k passes, zero exchanges."""
    import re

    import pandas as pd
    import ray

    token_re = re.compile(r"[^a-z0-9]+")
    id_type = ds.schema().types[ds.schema().names.index(id_col)]

    covered: set = set()
    picks = []
    for rank in range(k):
        cref = ray.put(covered)

        def best_partial(t: pa.Table, _cref=cref) -> pa.Table:
            cov = ray.get(_cref)
            best = None
            for did, txt in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
                if not isinstance(txt, str):
                    continue
                ws = set(token_re.sub(" ", txt.lower()).split())
                new = ws - cov
                key = (-len(new), did)
                if best is None or key < best[0]:
                    best = (key, did, sorted(new))
            if best is None:
                return pa.table({id_col: pa.array([], id_type),
                                 "gain": pa.array([], pa.int64()),
                                 "new_words": pa.array(
                                     [], pa.list_(pa.string()))})
            return pa.table({
                id_col: pa.array([best[1]], id_type),
                "gain": pa.array([-best[0][0]], pa.int64()),
                "new_words": pa.array([best[2]],
                                      pa.list_(pa.string()))})

        parts = ds.map_batches(best_partial, batch_format="pyarrow") \
            .to_pandas()
        if parts.empty:
            break
        parts = parts.sort_values(["gain", id_col],
                                  ascending=[False, True],
                                  kind="mergesort")
        top = parts.iloc[0]
        if int(top["gain"]) == 0:
            # vocabulary exhausted — every further greedy pick would
            # re-select an already-covered doc at zero marginal gain
            # (review finding); the oracle mirrors this with its
            # new_words > 0 filter (gains are non-increasing, so the
            # cut is a clean prefix on both sides)
            break
        covered |= set(top["new_words"])
        picks.append((rank, top[id_col], int(top["gain"]),
                      len(covered)))

    return pd.DataFrame(picks, columns=["sel_rank", id_col,
                                        "new_words", "covered_words"])
