"""TF-IDF top-k terms per document over a bounded feature vocabulary.

The classic corpus-statistics operator with sklearn ``max_features``
semantics: the vocabulary is the top-V words by document frequency
(ties: word asc), words outside it are not features. Bounding the
vocabulary is what makes the op scale-honest — the broadcast model is
O(V) regardless of corpus size, the same shape as the unigram-LM fit
(pipelines/lm.py).

Two passes, ONE shuffle total:
- fit: explode per-doc distinct words (combiner emits (word, df_partial)
  per batch) -> ``groupby(word).sum`` -> top-V -> ``ray.put``.
- score: per-doc tf over vocab words, tfidf = tf * ln(n_docs / df),
  row-local top-k (a document's terms never leave its batch), emit k
  rows per doc. No second shuffle: per-doc ranking is row-local.

Tokenization = the ASCII scheme shared with the LM/keyword oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .lm import ascii_words


def partial_doc_freq(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Combiner: (word, df) with df = #docs in this batch containing it."""
    counts: dict[str, int] = {}
    for t in batch[text_col].to_pylist():
        for w in set(ascii_words(t)):
            counts[w] = counts.get(w, 0) + 1
    return pa.table({
        "word": pa.array(list(counts.keys()), pa.string()),
        "df": pa.array(list(counts.values()), pa.int64()),
    })


def fit_df_vocab(ds, top_v: int = 20_000, text_col: str = "text"
                 ) -> dict[str, int]:
    """Distributed document-frequency count, top-V cut (df desc, word asc)."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        lambda b: partial_doc_freq(b, text_col), batch_format="pyarrow",
    ).groupby("word").aggregate(Sum("df", alias_name="df"))
    top = agg.sort(["df", "word"], descending=[True, False]) \
             .limit(top_v).to_pandas()
    return dict(zip(top["word"], top["df"].astype(int)))


class TfIdfTopK:
    """Actor-pool stage: df vocab fetched once per actor; per batch, each
    doc's top-k terms by (tfidf desc, word asc)."""

    def __init__(self, vocab_ref, n_docs: int, k: int = 5,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, dict) \
            else vocab_ref
        self.idf = {w: float(np.log(n_docs / df)) for w, df in vocab.items()}
        self.k = k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, terms, ranks, scores = [], [], [], []
        for did, t in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            tf: dict[str, int] = {}
            for w in ascii_words(t):
                if w in self.idf:
                    tf[w] = tf.get(w, 0) + 1
            # rank on the 6dp-rounded score: ln() can differ by 1 ulp
            # between libms, and mathematically-tied scores (e.g. tf=2,
            # df=50 vs tf=1, df=5 at n=500) must order identically here
            # and in the SQL oracle
            top = sorted(((round(c * self.idf[w], 6), w)
                          for w, c in tf.items()),
                         key=lambda p: (-p[0], p[1]))[: self.k]
            for r, (s, w) in enumerate(top):
                ids.append(did)
                terms.append(w)
                ranks.append(r + 1)
                scores.append(s)
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "rank": pa.array(ranks, pa.int64()),
            "tfidf": pa.array(scores, pa.float64()),
        })


def tfidf_topk(ds, k: int = 5, top_v: int = 20_000, id_col: str = "doc_id",
               text_col: str = "text"):
    """Fit df on ds, then stream-score ds; n_docs = total input rows."""
    import ray

    n_docs = ds.count()
    vocab = fit_df_vocab(ds, top_v=top_v, text_col=text_col)
    vref = ray.put(vocab)
    return ds.map_batches(
        TfIdfTopK, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"vocab_ref": vref, "n_docs": n_docs, "k": k,
                               "id_col": id_col, "text_col": text_col})
