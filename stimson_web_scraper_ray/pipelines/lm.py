"""Unigram language-model quality scoring (CCNet-style perplexity filter).

A standard pretraining-data curation step (Wenzek et al., CCNet) scores
every document by how "ordinary" its text is under a language model and
filters the tails. The scalable skeleton is what matters here:

- pass 1 (fit): corpus unigram counts via per-batch partial aggregation
  (combiner) -> small ``groupby(word).sum`` -> keep only the TOP-V vocab
  (sort by count desc, word asc) so the broadcast is O(V), never
  O(corpus vocab) -- at 100 TB the raw vocab is billions of keys, the
  model is a fixed-size table.
- pass 2 (score): broadcast the (word -> count, total) table once via
  ``ray.put``, read per actor in ``__init__``, then one streaming
  ``map_batches`` computes each doc's mean negative log-likelihood.
  Out-of-vocab tokens get a floor pseudo-count (alpha) -- the OOV rate
  itself is a useful quality signal and is emitted as a column.

Tokenization is the ASCII scheme shared with the keyword oracle
(`[^a-zA-Z0-9_ ]` stripped, lowered, space-split) so DuckDB can verify
the scores bit-for-bit.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_ASCII_STRIP_RE = re.compile(r"[^a-zA-Z0-9_ ]")
_OOV_ALPHA = 0.5


def ascii_words(text: str | None) -> list[str]:
    """Exactly DuckDB's  string_split(lower(regexp_replace(text,
    '[^a-zA-Z0-9_ ]', '', 'g')), ' ')  with empties dropped."""
    if not text:
        return []
    return [w for w in _ASCII_STRIP_RE.sub("", text).lower().split(" ") if w]


def partial_unigram_counts(batch: pa.Table, text_col: str = "text"
                           ) -> pa.Table:
    """Combiner: one (word, freq) row per distinct word per batch."""
    counts: dict[str, int] = {}
    for t in batch[text_col].to_pylist():
        for w in ascii_words(t):
            counts[w] = counts.get(w, 0) + 1
    return pa.table({
        "word": pa.array(list(counts.keys()), pa.string()),
        "freq": pa.array(list(counts.values()), pa.int64()),
    })


def fit_unigram_lm(ds, top_v: int = 20_000, text_col: str = "text"
                   ) -> tuple[dict[str, int], int]:
    """Distributed count + top-V cut. Returns (vocab counts, total tokens).

    The total is over ALL tokens (so probabilities stay a distribution
    even after the vocab cut); only the top-V counts are broadcast."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        lambda b: partial_unigram_counts(b, text_col),
        batch_format="pyarrow",
    ).groupby("word").aggregate(Sum("freq", alias_name="freq")).materialize()
    total = int(agg.sum("freq"))
    top = agg.sort(["freq", "word"], descending=[True, False]) \
             .limit(top_v).to_pandas()
    return dict(zip(top["word"], top["freq"].astype(int))), total


class UnigramNLLScorer:
    """Actor-pool stage: model table fetched once per actor, per-batch
    scoring emits (doc_id, n_toks, n_oov, avg_nll)."""

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        vocab, total = ray.get(model_ref) \
            if not isinstance(model_ref, tuple) else model_ref
        self.id_col = id_col
        self.text_col = text_col
        self.total = float(total)
        # one vectorized lookup table: word -> -ln(count/total)
        self.nll = pd.Series(
            {w: -np.log(c / self.total) for w, c in vocab.items()},
            dtype=np.float64)
        self.oov_nll = -np.log(_OOV_ALPHA / self.total)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_toks, n_oov, avg = [], [], [], []
        for did, t in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            words = ascii_words(t)
            if not words:
                continue
            scores = self.nll.reindex(words).to_numpy()
            oov = np.isnan(scores)
            scores[oov] = self.oov_nll
            ids.append(did)
            n_toks.append(len(words))
            n_oov.append(int(oov.sum()))
            avg.append(float(scores.mean()))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "n_toks": pa.array(n_toks, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "avg_nll": pa.array(avg, pa.float64()),
        })


def unigram_nll(ds, top_v: int = 20_000, id_col: str = "doc_id",
                text_col: str = "text"):
    """Two-pass pipeline: fit on ds, then stream-score ds. Docs with no
    ASCII tokens are dropped (no distribution to score them under)."""
    import ray

    model = fit_unigram_lm(ds, top_v=top_v, text_col=text_col)
    mref = ray.put(model)
    return ds.map_batches(
        UnigramNLLScorer, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"model_ref": mref, "id_col": id_col,
                               "text_col": text_col})


# --- DSIR importance weighting ---------------------------------------------


class DsirWeigher:
    """Actor-pool stage for Data Selection via Importance Resampling
    (Xie et al. 2023): per-doc log importance weight under a TARGET
    unigram LM vs the RAW-corpus LM, sum over tokens of
    ln(p_target(w)) - ln(p_raw(w)) with the same alpha OOV floor on both
    sides. Both fixed-size model tables broadcast once per actor.

    (DSIR hashes n-gram features to bound the vocab; the top-V cut here
    bounds it the same way with exactly-verifiable unigrams.)"""

    def __init__(self, target_ref, raw_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        self.id_col = id_col
        self.text_col = text_col

        def logp_series(model):
            vocab, total = model
            s = pd.Series(
                {w: np.log(c / float(total)) for w, c in vocab.items()},
                dtype=np.float64)
            return s, float(np.log(_OOV_ALPHA / float(total)))

        def fetch(ref):
            return ray.get(ref) if not isinstance(ref, tuple) else ref

        self.lp_t, self.oov_t = logp_series(fetch(target_ref))
        self.lp_r, self.oov_r = logp_series(fetch(raw_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_toks, lw = [], [], []
        for did, t in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            words = ascii_words(t)
            if not words:
                continue
            a = self.lp_t.reindex(words).to_numpy()
            a[np.isnan(a)] = self.oov_t
            b = self.lp_r.reindex(words).to_numpy()
            b[np.isnan(b)] = self.oov_r
            ids.append(did)
            n_toks.append(len(words))
            lw.append(float(np.sum(a - b)))
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "n_toks": pa.array(n_toks, pa.int64()),
            "log_weight": pa.array(lw, pa.float64()),
        })


def dsir_weights(ds, target_ds, top_v: int = 20_000,
                 id_col: str = "doc_id", text_col: str = "text"):
    """Three passes, all streaming: fit the target LM on ``target_ds``
    (e.g. a source/lang slice of the corpus), fit the raw LM on ``ds``,
    broadcast both O(V) tables, stream-score every doc. Docs with no
    ASCII tokens are dropped (no features to weigh)."""
    import ray

    t_model = fit_unigram_lm(target_ds, top_v=top_v, text_col=text_col)
    r_model = fit_unigram_lm(ds, top_v=top_v, text_col=text_col)
    tref, rref = ray.put(t_model), ray.put(r_model)
    return ds.map_batches(
        DsirWeigher, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"target_ref": tref, "raw_ref": rref,
                               "id_col": id_col, "text_col": text_col})


# --- CCNet-style perplexity buckets -----------------------------------------


def ccnet_buckets(ds, lang_ds, top_v: int = 20, n_parts: int = 16):
    """CCNet's head/middle/tail corpus split (Wenzek et al. 2020): score
    every doc's unigram-LM mean NLL, percent_rank it WITHIN its language
    (the paper's per-language calibration — raw perplexity thresholds
    don't transfer across languages), cut at thirds, and roll up
    (lang, bucket) counts.

    Composition of three existing distributed operators, all streaming:
    ``unigram_nll`` (distributed fit + broadcast-model actor scoring) →
    ``hash_join`` on doc_id to attach lang (doc-scaled exchange) →
    ``percent_rank_by_group`` (value-range two-phase scan) → a tiny
    groupby. NLL is rounded to 4dp BEFORE ranking so the engine and the
    SQL oracle rank identical keys (float summation-order noise is
    ~1e-12 relative; the window output would otherwise be
    order-sensitive at exact ties). Docs with no ASCII tokens are
    dropped by the scorer — and by the oracle's token CTE — on both
    sides. Returns pandas (lang, bucket, n_docs), group-scaled."""
    from ray.data.aggregate import Count

    from .analytics import percent_rank_by_group
    from .join import hash_join

    nll = unigram_nll(ds, top_v=top_v)

    def slim(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "nll_r": pa.array(
                np.round(t["avg_nll"].to_numpy(zero_copy_only=False), 4),
                pa.float64())})

    joined = hash_join(nll.map_batches(slim, batch_format="pyarrow"),
                       lang_ds, on="doc_id", n_parts=n_parts)
    ranked = percent_rank_by_group(joined, "lang", "nll_r",
                                   out_col="pct", n_parts=n_parts)

    def bucketize(t: pa.Table) -> pa.Table:
        pct = t["pct"].to_numpy(zero_copy_only=False)
        b = np.where(pct < 1.0 / 3.0, "head",
                     np.where(pct < 2.0 / 3.0, "middle", "tail"))
        return pa.table({"lang": t["lang"],
                         "bucket": pa.array(b, pa.string())})

    out = ranked.map_batches(bucketize, batch_format="pyarrow") \
        .groupby(["lang", "bucket"]) \
        .aggregate(Count(alias_name="n_docs")).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True)


# --- conditional bigram LM ---------------------------------------------------


def partial_bigram_counts(batch: pa.Table, text_col: str = "text"
                          ) -> pa.Table:
    """Combiner: one (w1, w2, freq) row per distinct adjacent pair per
    batch — the wide exchange carries distinct pairs, not token streams."""
    counts: dict[tuple, int] = {}
    for t in batch[text_col].to_pylist():
        ws = ascii_words(t)
        for k in zip(ws, ws[1:]):
            counts[k] = counts.get(k, 0) + 1
    w1 = [k[0] for k in counts]
    w2 = [k[1] for k in counts]
    return pa.table({
        "w1": pa.array(w1, pa.string()),
        "w2": pa.array(w2, pa.string()),
        "freq": pa.array(list(counts.values()), pa.int64()),
    })


def fit_bigram_counts(ds, top_b: int = 100, text_col: str = "text"
                      ) -> dict[tuple, int]:
    """Distributed bigram count + deterministic top-B cut
    (freq desc, w1 asc, w2 asc) so the broadcast model is O(B)."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        lambda b: partial_bigram_counts(b, text_col),
        batch_format="pyarrow",
    ).groupby(["w1", "w2"]).aggregate(Sum("freq", alias_name="freq"))
    top = agg.sort(["freq", "w1", "w2"],
                   descending=[True, False, False]) \
             .limit(top_b).to_pandas()
    return {(a, b): int(c) for a, b, c in
            zip(top["w1"], top["w2"], top["freq"])}


def fit_bigram_unigram(ds, text_col: str = "text"):
    """ONE corpus scan + ONE groupby fitting BOTH count tables: the
    per-batch combiner emits unigram rows with an empty-string w2
    sentinel (ascii_words never yields '', so the key spaces are
    disjoint) next to the pair rows, and a single (w1, w2) exchange
    aggregates everything. Returns the MATERIALIZED count Dataset —
    vocab+pairs-scaled, object-store-resident (spills at 100 TB) — so
    the top-N cuts, candidate filters and token totals downstream all
    read it without re-running the corpus scan. Measured: folds the
    two-fit doc_bigram_nll from 3 corpus passes to 2."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        pairs: dict[tuple, int] = {}
        uni: dict[str, int] = {}
        for txt in t[text_col].to_pylist():
            ws = ascii_words(txt)
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for k in zip(ws, ws[1:]):
                pairs[k] = pairs.get(k, 0) + 1
        w1 = [k[0] for k in pairs] + list(uni.keys())
        w2 = [k[1] for k in pairs] + [""] * len(uni)
        freq = list(pairs.values()) + list(uni.values())
        return pa.table({
            "w1": pa.array(w1, pa.string()),
            "w2": pa.array(w2, pa.string()),
            "freq": pa.array(freq, pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["w1", "w2"]).aggregate(Sum("freq", alias_name="freq")) \
        .materialize()


def _top_pairs(agg, top_b: int) -> dict[tuple, int]:
    import pyarrow.compute as pc

    pair_ds = agg.map_batches(
        lambda t: t.filter(pc.not_equal(t["w2"], "")),
        batch_format="pyarrow")
    top = pair_ds.sort(["freq", "w1", "w2"],
                       descending=[True, False, False]) \
        .limit(top_b).to_pandas()
    return {(a, b): int(c) for a, b, c in
            zip(top["w1"], top["w2"], top["freq"])}


def _unigram_slice(agg):
    import pyarrow.compute as pc

    return agg.map_batches(
        lambda t: t.filter(pc.equal(t["w2"], "")),
        batch_format="pyarrow")


class BigramNLLScorer:
    """Actor-pool stage: conditional bigram NLL per doc. For each
    adjacent pair, nll = ln(coalesce(c(w1), alpha) + 1) -
    ln(coalesce(c(w1,w2), alpha)) — an add-alpha-smoothed
    -ln P(w2 | w1) over the broadcast top-B bigram / top-U context
    tables. Word order matters (unlike doc_unigram_nll): scrambling a
    doc leaves its unigram score fixed but moves this one."""

    _SEP = "\x00"

    def __init__(self, model_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray

        bigrams, unigrams = ray.get(model_ref) \
            if not isinstance(model_ref, tuple) else model_ref
        self.id_col = id_col
        self.text_col = text_col
        self.cb = pd.Series(
            {w1 + self._SEP + w2: float(c)
             for (w1, w2), c in bigrams.items()}, dtype=np.float64)
        self.cu = pd.Series({w: float(c) for w, c in unigrams.items()},
                            dtype=np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # ONE model lookup per batch: all docs' pairs concatenate into
        # a single reindex (a per-doc reindex was the measured hot
        # spot), then segment sums via add.reduceat recover the means
        ids, seg_lens = [], []
        all_pairs: list[str] = []
        all_ctx: list[str] = []
        sep = self._SEP
        for did, t in zip(batch[self.id_col].to_pylist(),
                          batch[self.text_col].to_pylist()):
            ws = ascii_words(t)
            if len(ws) < 2:
                continue
            ids.append(did)
            seg_lens.append(len(ws) - 1)
            all_pairs.extend(a + sep + b for a, b in zip(ws, ws[1:]))
            all_ctx.extend(ws[:-1])
        if not ids:
            return pa.table({
                self.id_col: pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "avg_nll2": pa.array([], pa.float64()),
            })
        cb = self.cb.reindex(all_pairs).to_numpy()
        cb[np.isnan(cb)] = _OOV_ALPHA
        cu = self.cu.reindex(all_ctx).to_numpy()
        cu[np.isnan(cu)] = _OOV_ALPHA
        nll = np.log(cu + 1.0) - np.log(cb)
        lens = np.asarray(seg_lens, dtype=np.int64)
        offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
        avg = np.add.reduceat(nll, offs) / lens
        return pa.table({
            self.id_col: pa.array(ids, pa.int64()),
            "n_bigrams": pa.array(lens, pa.int64()),
            "avg_nll2": pa.array(avg, pa.float64()),
        })


def bigram_nll(ds, top_b: int = 100, top_u: int = 50,
               id_col: str = "doc_id", text_col: str = "text"):
    """Conditional-bigram perplexity scoring: ONE fused count fit
    (pair + context tables off a single corpus scan and exchange,
    fit_bigram_unigram), two small top-N cuts, one ray.put broadcast,
    one streaming scoring pass. Docs with <2 tokens are dropped (no
    bigram events to score)."""
    import ray

    agg = fit_bigram_unigram(ds, text_col=text_col)
    bigrams = _top_pairs(agg, top_b)
    uni_top = _unigram_slice(agg) \
        .sort(["freq", "w1"], descending=[True, False]) \
        .limit(top_u).to_pandas()
    unigrams = dict(zip(uni_top["w1"], uni_top["freq"].astype(int)))
    mref = ray.put((bigrams, unigrams))
    return ds.map_batches(
        BigramNLLScorer, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"model_ref": mref, "id_col": id_col,
                               "text_col": text_col})


def bigram_pmi(ds, top_b: int = 100, k: int = 10,
               text_col: str = "text") -> pd.DataFrame:
    """Collocation mining: pointwise mutual information of the top-B
    corpus bigrams, ln(c(w1,w2)·N / (c(w1)·c(w2))).

    ONE corpus scan: the fused fit_bigram_unigram exchange already
    holds the pair counts, every candidate word's exact count, and the
    token total (Σ unigram freqs) — the cuts and the candidate filter
    are all reads of that materialized, group-scaled table. Returns
    the k highest-PMI pairs (6-dp-rounded before ranking so ties are
    stable), pair count attached."""
    import pyarrow.compute as pc

    agg = fit_bigram_unigram(ds, text_col=text_col)
    bigrams = _top_pairs(agg, top_b)
    cand_set = sorted({w for pair in bigrams for w in pair})

    uni = _unigram_slice(agg)
    n_total = float(uni.sum("freq"))
    cand_tbl = uni.map_batches(
        lambda t, _c=set(cand_set): t.filter(
            pc.is_in(t["w1"], pa.array(sorted(_c), pa.string()))),
        batch_format="pyarrow").to_pandas()
    cu = dict(zip(cand_tbl["w1"], cand_tbl["freq"].astype(np.int64)))

    rows = []
    for (w1, w2), cb in bigrams.items():
        pmi = np.log(cb * n_total / (float(cu[w1]) * float(cu[w2])))
        rows.append((w1, w2, int(cb), round(float(pmi), 6)))
    out = pd.DataFrame(rows, columns=["w1", "w2", "n_pair", "pmi"])
    return out.sort_values(["pmi", "w1", "w2"],
                           ascending=[False, True, True]) \
        .head(k).reset_index(drop=True)
