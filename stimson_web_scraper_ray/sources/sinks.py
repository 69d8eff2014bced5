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
