"""Composite training-set pipeline: the end-to-end LLM-data path a user
would actually run over a crawl — decontaminate → quality-filter →
exact-dedup → token-count — assembled from the engine's own stages.

Scale shape: one broadcast small side (the benchmark gram set), ONE
map_batches pass computing contamination + Gopher signals + md5 + token
count per row (text is read once and never shuffled), then a single
``groupby(text_md5)`` aggregate whose input rows carry three int64
columns — the only wide exchange, over hashes not text. Output is one
row per surviving distinct document.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .dedup import _gram_hashes


def train_set(ds, id_col: str = "doc_id", text_col: str = "text",
              n_gram: int = 8, bench_mod: int = 37):
    """(doc_id, n_tokens) of the de-duplicated, decontaminated,
    Gopher-filtered corpus; doc_id is the minimum id of each exact-dup
    group's survivors."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from .textstats import add_gopher_filters

    def bench_gram_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        parts = [_gram_hashes(t, n_gram) for t, k in
                 zip(batch[text_col].to_pylist(), ids % bench_mod == 0)
                 if k]
        u = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, np.uint64))
        return pa.table({"g": pa.array(u, pa.uint64())})

    bench = ds.map_batches(bench_gram_rows, batch_format="pyarrow") \
        .to_pandas()["g"].to_numpy(dtype=np.uint64, na_value=0)
    bench_ref = ray.put(np.unique(bench))

    def survivors(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        g = add_gopher_filters(batch, text_col)
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keep_flags = g["gopher_keep"].to_pylist()
        out_ids, out_md5, out_tok = [], [], []
        for did, text, keep in zip(ids, texts, keep_flags):
            if did % bench_mod == 0 or not keep:
                continue
            grams = _gram_hashes(text, n_gram)
            if np.isin(grams, bset, assume_unique=True).any():
                continue
            out_ids.append(did)
            out_md5.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            out_tok.append(len(text.split()))
        return pa.table({
            id_col: pa.array(out_ids, pa.int64()),
            "text_md5": pa.array(out_md5, pa.string()),
            "n_tokens": pa.array(out_tok, pa.int64()),
        })

    kept = ds.map_batches(survivors, batch_format="pyarrow")
    return kept.groupby("text_md5").aggregate(
        Min(id_col, alias_name=id_col),
        Min("n_tokens", alias_name="n_tokens"),
    ).drop_columns(["text_md5"])


def web_train_set(articles_ds, url_col: str = "url",
                  text_col: str = "text"):
    """The graft's END-TO-END story in one pipeline: crawled+extracted
    articles → language-ID → Gopher quality filter → exact content
    dedup → token count. Same scale shape as ``train_set``: ONE
    map_batches pass over the article text (langid trigram scores,
    Gopher signals, md5, token count — text read once, never shuffled),
    then a single ``groupby(text_md5)`` over int64/hash columns. Output
    is one row per surviving distinct article: (url, lang_pred,
    n_tokens), keeper = min url of each exact-dup group.

    All duplicate copies agree on text-derived columns, so Min() per
    column is deterministic and consistent."""
    from ray.data.aggregate import Min

    from .textstats import add_gopher_filters, add_langid

    def signals(batch: pa.Table) -> pa.Table:
        lang = add_langid(batch, text_col=text_col)["lang_pred"]
        keep = add_gopher_filters(batch, text_col)["gopher_keep"] \
            .to_pylist()
        urls = batch[url_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_url, out_lang, out_md5, out_tok = [], [], [], []
        for url, text, lp, k in zip(urls, texts, lang.to_pylist(), keep):
            if not k or not text:
                continue
            out_url.append(url)
            out_lang.append(lp)
            out_md5.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            out_tok.append(len(text.split()))
        return pa.table({
            "text_md5": pa.array(out_md5, pa.string()),
            "url": pa.array(out_url, pa.string()),
            "lang_pred": pa.array(out_lang, pa.string()),
            "n_tokens": pa.array(out_tok, pa.int64()),
        })

    return articles_ds.map_batches(signals, batch_format="pyarrow") \
        .groupby("text_md5").aggregate(
            Min("url", alias_name="url"),
            Min("lang_pred", alias_name="lang_pred"),
            Min("n_tokens", alias_name="n_tokens"),
        ).drop_columns(["text_md5"])
