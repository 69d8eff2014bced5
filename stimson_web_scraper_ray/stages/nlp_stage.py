"""NLP actor-pool stage: keywords + summary per article (T1-tier).

The reference reloads the spaCy model *per article* (article.py:316-346, a
known perf sink); here the per-language state (stopword sets, compiled
regexes) is built once per actor. Feature-flagged out of the throughput
baseline like the reference's own warning suggests (article.py:347-348).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.nlp import document_keywords, summarize


class NlpArticles:
    """ds.map_batches(NlpArticles, batch_format="pyarrow",
    concurrency=(1, N), batch_size=B) over a table with text/meta_lang."""

    def __init__(self, count: int = 10, max_keywords: int = 35,
                 max_summary: int = 5_000):
        self.count = count
        self.max_keywords = max_keywords
        self.max_summary = max_summary

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs = (batch["meta_lang"].to_pylist()
                 if "meta_lang" in batch.column_names
                 else ["en"] * len(texts))
        keywords, summaries = [], []
        for text, lang in zip(texts, langs):
            lang = lang or "en"
            keywords.append(document_keywords(
                text or "", lang, self.count, self.max_keywords))
            summaries.append(summarize(
                text or "", 5, lang, self.max_summary))
        batch = batch.drop_columns(
            [c for c in ("keywords", "summary") if c in batch.column_names])
        batch = batch.append_column(
            "keywords", pa.array(keywords, pa.list_(pa.string())))
        return batch.append_column("summary",
                                   pa.array(summaries, pa.string()))
