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
