"""Sinks: article JSON (S7), wikitable TSV (S9), partitioned parquet.

The parquet layout (one ``round=N`` directory per crawl round, ``part-*``
files within) is the resumable-output contract: a rerun skips directories
whose round checkpoint carries ``_SUCCESS``.
"""

from __future__ import annotations

import json

import pyarrow as pa


def write_articles_json(ds, path: str):
    """Flat-dict-per-article JSON lines ≈ Article.get_json
    (article.py:376-393)."""
    return ds.write_json(path)


def _flatten_tables_batch(batch: pa.Table) -> pa.Table:
    """tables JSON column → one row per (url, table_name, row_idx, tsv_line)
    — the wikitable → tab-separated dump of article_test.py:240-250."""
    urls, names, idxs, lines = [], [], [], []
    for url, tables_json in zip(batch["url"].to_pylist(),
                                batch["tables"].to_pylist()):
        if not tables_json:
            continue
        try:
            tables = json.loads(tables_json)
        except (TypeError, ValueError):
            continue
        for table in tables:
            for ri, row in enumerate(table.get("rows", [])):
                urls.append(url)
                names.append(str(table.get("name", "")))
                idxs.append(ri)
                lines.append("\t".join(str(c) for c in row))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "table_name": pa.array(names, pa.string()),
        "row_idx": pa.array(idxs, pa.int32()),
        "tsv_line": pa.array(lines, pa.string()),
    })


def write_tables_tsv(ds, path: str):
    """articles (url, tables) → flattened TSV rows as CSV output."""
    flat = ds.map_batches(_flatten_tables_batch, batch_format="pyarrow")
    return flat.write_csv(path)


def write_partitioned_parquet(ds, out_dir: str, partition_col: str):
    """Resumable hive-partitioned parquet write (the generic analogue of
    the crawl's ``round=N`` checkpoint layout): one ``col=value``
    directory per partition value, ``_SUCCESS``-marked on completion.

    A re-run (1) deletes half-written directories (no marker), (2) PRUNES
    already-finished partition values from the input stream — a row-local
    filter, so skipped partitions cost no write and no shuffle — and
    (3) writes only the remainder. Returns (n_skipped, n_written)
    partition counts.

    Partitioning is by VALUE; for key-range layouts, derive the range
    label as a column first and partition on it.
    """
    import os
    import shutil

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)
    prefix = f"{partition_col}="
    done, half = set(), []
    for d in os.listdir(out_dir):
        full = os.path.join(out_dir, d)
        if not (d.startswith(prefix) and os.path.isdir(full)):
            continue
        if os.path.exists(os.path.join(full, "_SUCCESS")):
            done.add(d[len(prefix):])
        else:
            half.append(full)
    for full in half:                   # crashed mid-write: rewrite whole dir
        shutil.rmtree(full)

    if done:
        done_arr = pa.array(sorted(done), pa.string())

        def prune(t: pa.Table) -> pa.Table:
            vals = pc.cast(t[partition_col], pa.string())
            return t.filter(pc.invert(pc.is_in(vals, value_set=done_arr)))

        ds = ds.map_batches(prune, batch_format="pyarrow")

    ds.write_parquet(out_dir, partition_cols=[partition_col])

    written = 0
    for d in os.listdir(out_dir):
        full = os.path.join(out_dir, d)
        if d.startswith(prefix) and os.path.isdir(full) \
                and not os.path.exists(os.path.join(full, "_SUCCESS")):
            open(os.path.join(full, "_SUCCESS"), "w").close()
            written += 1
    return len(done), written
