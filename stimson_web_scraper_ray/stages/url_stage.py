"""Frontier candidate normalization — vectorized batch transforms.

Candidates (url, parent fields) → canonical url, 64-bit hash, host,
validity. This is the M1-M9 block of SURVEY.md §2.2 applied columnwise;
the url-algebra scalars are pure Python (urllib parsing), so "vectorized"
here means one tight loop per Arrow batch with zero-copy passthrough,
compiled regexes cached at module import.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.urlnorm import (
    canon_hash64,
    get_domain,
    prepare_url,
    valid_url,
)


def normalize_candidates(batch: pa.Table) -> pa.Table:
    """Adds url_canon, url_hash (u64), host, is_valid columns.

    ``source_url`` column (if present) is used for relative-join semantics;
    candidate harvests already absolutize so it is usually absent.
    """
    urls = batch["url"].to_pylist()
    sources = (batch["source_url"].to_pylist()
               if "source_url" in batch.column_names else [None] * len(urls))

    canon = [prepare_url(u, s) if s else (u if u else "")
             for u, s in zip(urls, sources)]
    hashes = np.fromiter((canon_hash64(c) for c in canon),
                         dtype=np.uint64, count=len(canon))
    hosts = [get_domain(c) or "" for c in canon]
    valid = [valid_url(c) for c in canon]

    out = batch.drop_columns(["source_url"]) if "source_url" in batch.column_names else batch
    out = out.append_column("url_canon", pa.array(canon, pa.string()))
    out = out.append_column("url_hash", pa.array(hashes, pa.uint64()))
    out = out.append_column("host", pa.array(hosts, pa.string()))
    out = out.append_column("is_valid", pa.array(valid, pa.bool_()))
    return out


def filter_valid(batch: pa.Table) -> pa.Table:
    return batch.filter(batch["is_valid"])


def salt_hosts(batch: pa.Table, heavy_hosts: dict[str, int],
               salt_buckets: int = 16) -> pa.Table:
    """Adds a ``part_key`` column: hash(host), except heavy hosts get
    ``hash(host) + per-row salt`` so one hot host spreads over
    ``salt_buckets`` partitions (north rule: salted splits for heavy
    hosts). ``heavy_hosts`` maps host → candidate count (from a small
    groupby done once per round)."""
    hosts = batch["host"].to_pylist()
    # NB: stay in uint64 for the modulo — `np.uint64 % python_int` promotes
    # BOTH operands to float64 (numpy mixed-kind rule), which rounds away
    # the low bits of a 64-bit hash and made every salt come out 0 (one
    # heavy host collapsed onto a single part_key → straggler actor).
    salts = (np.asarray(batch["url_hash"].to_numpy(zero_copy_only=False),
                        dtype=np.uint64)
             % np.uint64(salt_buckets)).astype(np.int64)
    keys = np.empty(len(hosts), dtype=np.int64)
    host_hash_cache: dict[str, int] = {}
    for i, h in enumerate(hosts):
        base = host_hash_cache.get(h)
        if base is None:
            # deterministic across processes (unlike builtin hash())
            base = canon_hash64(h) & 0x7FFFFFFF
            host_hash_cache[h] = base
        if h in heavy_hosts:
            keys[i] = base + int(salts[i]) + 1
        else:
            keys[i] = base
    return batch.append_column("part_key", pa.array(keys, pa.int64()))
