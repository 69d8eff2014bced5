"""NLP actor-pool stage: keywords + summary + entities per article
(T1-tier plus the NER surface of named_entity_recognition.py).

The reference reloads the spaCy model *per article* (article.py:316-346, a
known perf sink); here the per-language state (stopword sets, compiled
regexes) is built once per actor. Feature-flagged out of the throughput
baseline like the reference's own warning suggests (article.py:347-348).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.ner import extract_dates, extract_persons
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
        keywords, summaries, persons, first_dates = [], [], [], []
        for text, lang in zip(texts, langs):
            lang = lang or "en"
            keywords.append(document_keywords(
                text or "", lang, self.count, self.max_keywords))
            summaries.append(summarize(
                text or "", 5, lang, self.max_summary))
            persons.append(extract_persons((text or "")[:20_000]))
            ds = extract_dates((text or "")[:20_000])
            first_dates.append(ds[0].date().isoformat() if ds else None)
        batch = batch.drop_columns(
            [c for c in ("keywords", "summary", "persons", "text_date")
             if c in batch.column_names])
        batch = batch.append_column(
            "keywords", pa.array(keywords, pa.list_(pa.string())))
        batch = batch.append_column("summary",
                                    pa.array(summaries, pa.string()))
        batch = batch.append_column(
            "persons", pa.array(persons, pa.list_(pa.string())))
        # article.py:362-371 fallback: first date found in the raw text
        # repairs a missing publish_date downstream
        batch = batch.append_column("text_date",
                                    pa.array(first_dates, pa.string()))
        if "publish_date" in batch.column_names:
            pub = batch["publish_date"].to_pylist()
            repaired = [p if p else d for p, d in zip(pub, first_dates)]
            idx = batch.column_names.index("publish_date")
            batch = batch.set_column(
                idx, "publish_date", pa.array(repaired, pa.string()))
        return batch
