"""Distributed inverted index: term -> sorted postings list, plus boolean
(conjunctive) retrieval over it.

The retrieval-side counterpart of the corpus statistics family (tfidf.py,
lm.py): the same ascii tokenization and the same one-shuffle shape, but the
artifact is the postings table itself — the thing a web-scale pipeline
writes as partitioned parquet and serves lookups from.

Scale shape:
- build: per-batch DISTINCT (term, doc_id) pairs (combiner — a term
  repeated in a doc ships once) -> ONE salted exchange keyed on a stable
  64-bit term hash -> per-part vectorized assembly of sorted distinct
  postings. Posting lists are distributed across parts; nothing
  corpus-sized touches the driver.
- search (AND of k terms): the k posting rows are filtered where they
  live, exploded back to (doc_id) rows, and reduced by a count==k
  groupby — the standard postings-intersection as a Dataset op, so a
  hot term's million-doc posting list never lands on one node.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .lm import ascii_words


def _term_pairs(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    terms: list[str] = []
    ids: list[int] = []
    for did, txt in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
        for w in set(ascii_words(txt)):
            terms.append(w)
            ids.append(did)
    return pa.table({
        "term": pa.array(terms, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
    })


def _term_key(t: pa.Table) -> np.ndarray:
    from .textstats import word_hash64

    words = t["term"].to_pylist()
    return np.fromiter((word_hash64(w) for w in words),
                       dtype=np.uint64, count=len(words)).view(np.int64)


def build_inverted_index(ds, id_col: str = "doc_id",
                         text_col: str = "text", n_parts: int = 64):
    """Dataset of (term, df, postings: list<int64> sorted asc, distinct).
    df == len(postings) by construction (document frequency)."""
    from .shuffle import salted_partition_apply

    pairs = ds.map_batches(
        lambda b: _term_pairs(b, id_col, text_col), batch_format="pyarrow")

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["term", "doc_id"]) \
               .sort_values(["term", "doc_id"], kind="mergesort")
        g = df.groupby("term", sort=True)["doc_id"]
        postings = g.agg(list)
        out = pd.DataFrame({
            "term": postings.index,
            "df": postings.map(len).astype("int64"),
            "postings": postings.values,
        })
        return out.reset_index(drop=True)

    return salted_partition_apply(pairs, assemble, _term_key,
                                  n_parts=n_parts)


def bm25_topk(ds, index_ds, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """Okapi BM25 ranked retrieval (Robertson & Walker, public formula):
    top-k docs for a bag-of-terms query.

    Scale shape: the only per-term state is df for the QUERY terms — a
    k-entry broadcast, fetched from the posting table where it lives (a
    filter on the index Dataset, never a full read). Scoring is one
    streamed pass over docs: tf comes from the doc text itself (no
    positional index needed for bag-of-words BM25), dl/avgdl from a
    cheap count pass. Ranking = sort on the 4-dp-rounded score (ties:
    doc_id asc) + limit — the same ordering the SQL oracle computes.
    """
    import ray

    want = sorted(set(terms))
    n_docs = ds.count()

    # dl per doc + corpus avgdl in one aggregate pass
    def doc_len(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        dls = [len(ascii_words(x)) for x in t[text_col].to_pylist()]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "dl": pa.array(dls, pa.int64())})

    lens = ds.map_batches(doc_len, batch_format="pyarrow")
    total_dl = lens.sum("dl") or 0
    avgdl = (total_dl / n_docs) if n_docs else 1.0

    # df for the query terms only: filter the posting table in place
    def df_rows(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t["term"], value_set=pa.array(want))
        hit = t.filter(mask)
        return hit.select(["term", "df"])

    df_tbl = index_ds.map_batches(df_rows, batch_format="pyarrow") \
        .to_pandas()
    dfs = dict(zip(df_tbl["term"], df_tbl["df"].astype(int)))
    idf = {t: float(np.log(1.0 + (n_docs - dfs[t] + 0.5)
                           / (dfs[t] + 0.5)))
           for t in want if t in dfs}
    idf_ref = ray.put((idf, float(avgdl)))

    def score(t: pa.Table) -> pa.Table:
        idf_map, avg = ray.get(idf_ref)
        ids, scores = [], []
        for did, txt in zip(t[id_col].to_pylist(),
                            t[text_col].to_pylist()):
            ws = ascii_words(txt)
            if not ws:
                continue
            dl = len(ws)
            s = 0.0
            for term, w_idf in idf_map.items():
                tf = ws.count(term)
                if tf:
                    s += w_idf * tf * (k1 + 1) \
                        / (tf + k1 * (1 - b + b * dl / avg))
            if s > 0:
                ids.append(did)
                scores.append(round(s, 4))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "bm25": pa.array(scores, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow") \
        .sort(["bm25", id_col], descending=[True, False]).limit(k)


def phrase_search(ds, phrase: list[str], id_col: str = "doc_id",
                  text_col: str = "text", index_ds=None,
                  broadcast_limit_bytes: int = 64 << 20,
                  stats: dict | None = None):
    """Exact phrase occurrence counts per doc: sliding-window match of
    the phrase terms, overlapping matches counted. Tokenization is
    ``ascii_words`` with pure-digit tokens dropped — the SAME stream the
    inverted index and the SQL oracle derive, so index pruning is a true
    superset and engine/oracle parity is tokenizer-exact (not
    corpus-dependent).

    With ``index_ds`` (a ``build_inverted_index`` output): ONE
    conjunctive probe over the phrase's distinct terms yields the
    candidate doc ids (any doc with a phrase hit contains every term,
    so candidates are a superset); the corpus is then semi-filtered to
    candidates — byte-probed broadcast id set when it fits, else a
    distributed semi hash-join — and the sliding-window verify runs
    ONLY on candidate docs. Without ``index_ds``: one streamed pass
    over the whole corpus. Returns (doc_id, n_hits) sorted by doc_id.
    ``stats`` (optional, test instrumentation) gets ``n_candidates``,
    ``verified_docs`` and ``path`` ('scan'|'broadcast'|'semi_join');
    filling it costs extra count passes."""
    import ray

    terms = list(phrase)
    k = len(terms)

    def count_hits(t: pa.Table) -> pa.Table:
        ids, hits = [], []
        for did, txt in zip(t[id_col].to_pylist(),
                            t[text_col].to_pylist()):
            ws = [w for w in ascii_words(txt) if not w.isdigit()]
            n = sum(1 for i in range(len(ws) - k + 1)
                    if ws[i:i + k] == terms)
            if n:
                ids.append(did)
                hits.append(n)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_hits": pa.array(hits, pa.int64())})

    cand = ds
    if index_ds is not None:
        hits = search_and(index_ds, sorted(set(terms))).materialize()
        n_cand = hits.count()
        if stats is not None:
            stats["n_candidates"] = n_cand
        if n_cand * 8 <= broadcast_limit_bytes:
            from .shuffle import collect_sorted_keys, sorted_membership

            ids_ref = ray.put(collect_sorted_keys(hits, "doc_id"))

            def keep_candidates(t: pa.Table) -> pa.Table:
                cids = ray.get(ids_ref)
                rows = t[id_col].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                return t.filter(pa.array(sorted_membership(cids, rows)))

            cand = ds.map_batches(keep_candidates, batch_format="pyarrow")
            if stats is not None:
                stats["path"] = "broadcast"
        else:
            from .join import hash_join

            right = hits if id_col == "doc_id" \
                else hits.rename_columns({"doc_id": id_col})
            cand = hash_join(ds, right, on=id_col, how="semi")
            if stats is not None:
                stats["path"] = "semi_join"
    elif stats is not None:
        stats["path"] = "scan"
    if stats is not None:
        stats["verified_docs"] = cand.count()

    return cand.map_batches(count_hits, batch_format="pyarrow") \
        .sort(id_col)


def search_or(index_ds, terms: list[str]):
    """Disjunctive boolean search: docs containing ANY of ``terms``, as
    a Dataset of (doc_id, n_matched) with n_matched = how many of the
    query terms the doc contains, sorted by doc_id asc. Same
    explode-where-the-postings-live shape as ``search_and`` — the
    groupby count IS the answer instead of a ==k filter, so a hot
    term's posting list still never lands on one node."""
    import ray
    from ray.data.aggregate import Count

    want = ray.put(frozenset(terms))

    def explode(t: pa.Table) -> pa.Table:
        w = ray.get(want)
        out: list[int] = []
        for term, postings in zip(t["term"].to_pylist(),
                                  t["postings"].to_pylist()):
            if term in w:
                out.extend(postings)
        return pa.table({"doc_id": pa.array(out, pa.int64())})

    return index_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Count(alias_name="n_matched")) \
        .sort("doc_id")


def phrase_tokens(text: str | None) -> list[str]:
    """The phrase-search token stream: ``ascii_words`` with pure-digit
    tokens dropped — the same stream the bigram pick (corpus_bigrams)
    and the phrase SQL oracle derive, so positions computed over it are
    oracle-aligned."""
    return [w for w in ascii_words(text) if not w.isdigit()]


def build_positional_index(ds, id_col: str = "doc_id",
                           text_col: str = "text", n_parts: int = 64):
    """Positional inverted index: one row per (term, doc_id) with the
    sorted int32 positions of the term in the doc's ``phrase_tokens``
    stream. Same one-salted-exchange build shape as
    ``build_inverted_index`` (term-hash partitioned, assembled where the
    term lives); the artifact answers phrase queries WITHOUT touching
    the corpus text again (see ``phrase_search_positional``). Index
    volume is one int32 per corpus token — the classic positional-index
    cost, paid once at build so every phrase query is postings-only."""
    from .shuffle import salted_partition_apply

    def pos_pairs(batch: pa.Table) -> pa.Table:
        terms: list[str] = []
        ids: list[int] = []
        poss: list[list[int]] = []
        for did, txt in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
            by_term: dict[str, list[int]] = {}
            for i, w in enumerate(phrase_tokens(txt)):
                by_term.setdefault(w, []).append(i)
            for w, ps in by_term.items():
                terms.append(w)
                ids.append(did)
                poss.append(ps)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "positions": pa.array(poss, pa.list_(pa.int32())),
        })

    def assemble(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["term", "doc_id"], kind="mergesort")

    pairs = ds.map_batches(pos_pairs, batch_format="pyarrow")
    return salted_partition_apply(pairs, assemble, _term_key,
                                  n_parts=n_parts)


def _plain_positions(col) -> pa.Array:
    """``positions`` column → one plain (Large)ListArray. The pandas
    exchange re-types ragged int cells as Ray's variable-shaped tensor
    extension (storage = struct<data: large_list, shape: list>) — its
    data field comes back zero-copy; chunked plain lists concatenate;
    anything else rebuilds through pylist. One copy of the snippet the
    positional query paths previously each carried."""
    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 0:      # all-filtered batch
            return pa.array([], type=pa.list_(pa.int64()))
        if col.num_chunks == 1:
            return _plain_positions(col.chunk(0))
        # unwrap each chunk FIRST (extension arrays don't concat),
        # then concat on a common plain type
        parts = [_plain_positions(c).cast(pa.large_list(pa.int64()))
                 for c in col.chunks]
        return pa.concat_arrays(parts)
    if isinstance(col, pa.ExtensionArray):
        st = col.storage
        if isinstance(st, pa.StructArray):
            return st.field("data")
        col = st
    if isinstance(col, (pa.ListArray, pa.LargeListArray)):
        return col
    return pa.array([np.asarray(x, dtype=np.int64)
                     for x in col.to_pylist()],
                    type=pa.list_(pa.int64()))


def phrase_search_positional(pos_index_ds, phrase: list[str],
                             n_parts: int = 64):
    """Exact phrase counts per doc resolved ENTIRELY from the
    positional index — the corpus text is never read at query time
    (contrast ``phrase_search``, which prunes via the boolean index
    then re-tokenizes candidate docs).

    Algebra: a phrase hit starts at token position p iff slot i's term
    sits at p+i for every slot. Each filtered index row (term, doc,
    positions) emits, per phrase slot i with that term, the aligned
    start candidates ``positions - i``; a (doc, aligned) key then holds
    at most ONE row per slot (the slot fixes the position), so a plain
    count == len(phrase) is exact even with repeated phrase terms.
    One doc-functional salted exchange does both the alignment count
    and the per-doc hit count. Returns (doc_id, n_hits) sorted by
    doc_id, overlapping matches counted — the ``phrase_search``
    contract."""
    import pyarrow.compute as pc

    from .shuffle import salted_partition_apply

    slots = list(enumerate(phrase))
    k = len(slots)
    want = sorted({t for _, t in slots})

    def explode_aligned(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["term"], value_set=pa.array(want))
        t = t.filter(mask)
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "aligned": pa.array([], pa.int64())})
        pos_col = _plain_positions(t["positions"])
        flat = pos_col.values.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = pc.list_parent_indices(pos_col) \
            .to_numpy(zero_copy_only=False)
        doc_all = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[parent]
        term_all = np.asarray(t["term"].to_pylist(), dtype=object)[parent]
        docs_out, aligned_out = [], []
        for i, term in slots:
            m = term_all == term
            a = flat[m] - i
            keep = a >= 0
            docs_out.append(doc_all[m][keep])
            aligned_out.append(a[keep])
        return pa.table({
            "doc_id": pa.array(np.concatenate(docs_out), pa.int64()),
            "aligned": pa.array(np.concatenate(aligned_out), pa.int64()),
        })

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        per_start = df.groupby(["doc_id", "aligned"], sort=False) \
                      .size().reset_index(name="n_slots")
        hit = per_start[per_start["n_slots"] == k]
        out = hit.groupby("doc_id", sort=True).size() \
                 .reset_index(name="n_hits")
        out["n_hits"] = out["n_hits"].astype("int64")
        return out

    rows = pos_index_ds.map_batches(explode_aligned,
                                    batch_format="pyarrow")
    return salted_partition_apply(
        rows, count_part,
        lambda t: t["doc_id"].to_numpy(zero_copy_only=False)
        .astype(np.int64),
        n_parts=n_parts).sort("doc_id")


def search_any_phrase(pos_index_ds, phrases: list[list[str]],
                      n_parts: int = 64):
    """OR-of-phrases search resolved entirely from the positional
    index: per-doc overlapping occurrence counts for EVERY phrase in
    ``phrases``, in one pass — the disjunctive upgrade of
    ``phrase_search_positional`` (same alignment algebra, all phrases
    share the single doc-functional exchange instead of one query per
    phrase). Returns (doc_id, phrase, n_hits) rows for n_hits > 0,
    sorted by (doc_id, phrase); ``phrase`` is the space-joined query.

    Scale shape: the index filter keeps only the UNION of the phrases'
    terms, alignment rows carry (query, doc, aligned-start) ints, and
    the per-part count is the same two-groupby vectorized fold — the
    exchange is paid once for the whole disjunction."""
    import pyarrow.compute as pc

    from .shuffle import salted_partition_apply

    if not phrases or any(not ph for ph in phrases):
        raise ValueError("phrases must be non-empty lists of terms")
    labels = [" ".join(ph) for ph in phrases]
    if len(set(labels)) != len(labels):
        raise ValueError("duplicate phrases in the disjunction")
    qslots = [(q, i, term) for q, ph in enumerate(phrases)
              for i, term in enumerate(ph)]
    k_of_q = np.array([len(ph) for ph in phrases], np.int64)
    want = sorted({t for _, _, t in qslots})

    def explode_aligned(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["term"], value_set=pa.array(want))
        t = t.filter(mask)
        empty = pa.table({"q": pa.array([], pa.int64()),
                          "doc_id": pa.array([], pa.int64()),
                          "aligned": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        pos_col = _plain_positions(t["positions"])
        flat = pos_col.values.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        parent = pc.list_parent_indices(pos_col) \
            .to_numpy(zero_copy_only=False)
        doc_all = t["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)[parent]
        term_all = np.asarray(t["term"].to_pylist(), dtype=object)[parent]
        qs_out, docs_out, aligned_out = [], [], []
        for q, i, term in qslots:
            m = term_all == term
            a = flat[m] - i
            keep = a >= 0
            qs_out.append(np.full(int(keep.sum()), q, np.int64))
            docs_out.append(doc_all[m][keep])
            aligned_out.append(a[keep])
        if not qs_out:
            return empty
        return pa.table({
            "q": pa.array(np.concatenate(qs_out), pa.int64()),
            "doc_id": pa.array(np.concatenate(docs_out), pa.int64()),
            "aligned": pa.array(np.concatenate(aligned_out), pa.int64()),
        })

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "q": pd.Series([], dtype="int64"),
                "n_hits": pd.Series([], dtype="int64")})
        per_start = df.groupby(["q", "doc_id", "aligned"], sort=False) \
                      .size().reset_index(name="n_slots")
        hit = per_start[per_start["n_slots"].to_numpy()
                        == k_of_q[per_start["q"].to_numpy()]]
        out = hit.groupby(["q", "doc_id"], sort=False).size() \
                 .reset_index(name="n_hits")
        out["n_hits"] = out["n_hits"].astype("int64")
        return out[["doc_id", "q", "n_hits"]]

    rows = pos_index_ds.map_batches(explode_aligned,
                                    batch_format="pyarrow")
    counts = salted_partition_apply(
        rows, count_part,
        lambda t: t["doc_id"].to_numpy(zero_copy_only=False)
        .astype(np.int64),
        n_parts=n_parts)

    lab = np.asarray(labels, dtype=object)

    def attach_label(t: pa.Table) -> pa.Table:
        qs = t["q"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "phrase": pa.array(lab[qs], pa.string()),
            "n_hits": t["n_hits"],
        })

    return counts.map_batches(attach_label, batch_format="pyarrow") \
        .sort(["doc_id", "phrase"])


def bm25_proximity_topk(pos_index_ds, terms: list[str], k: int = 20,
                        k1: float = 1.2, b: float = 0.75,
                        window: int = 5, prox_weight: float = 1.0,
                        n_parts: int = 64):
    """Proximity-boosted BM25 ranked retrieval resolved ENTIRELY from
    the positional index — one postings-only pass composes the BM25
    bag-of-terms score with a term-pair proximity bonus (the
    Rasolofo–Savoy shape): for each ADJACENT query-term pair (a, b)
    both present in a doc, if the minimum token distance dmin between
    any occurrence pair is ≤ ``window``, the doc earns
    ``prox_weight · min(idf_a, idf_b) / (1 + dmin)``. Corpus text is
    never read at query time.

    Scale shape: df for the query terms is a filter on the posting
    rows (k-entry broadcast); per-doc lengths come from ONE salted
    doc-keyed exchange over (doc, Σ len(positions)) partials — the
    only corpus-scaled exchange, and the piece a production deployment
    would precompute into a doc-length sidecar at build time; scoring
    joins the filtered query-term rows to their dl and runs per-doc in
    one more candidate-scaled exchange (positions per candidate doc
    are bounded; the min-distance scan is a vectorized searchsorted
    against the sorted posting arrays). n_docs = docs present in the
    index (≥1 surviving token of the digit-dropped stream), matching
    the SQL oracle's dl universe. Ranking = 4-dp-rounded score desc,
    doc_id asc, limit k — the ``index_search_bm25`` determinism
    contract. Returns (doc_id, score)."""
    import pyarrow.compute as pc
    import ray

    from .join import hash_join
    from .shuffle import salted_partition_apply

    want = sorted(set(terms))
    adj_pairs = [(a, b_) for a, b_ in zip(terms, terms[1:]) if a != b_]

    # --- global stats: (doc, dl) via one salted exchange ---
    def dl_partial(t: pa.Table) -> pa.Table:
        pos = _plain_positions(t["positions"])
        n = pc.list_value_length(pos).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        df_ = pd.DataFrame({"doc_id": d, "dl": n})
        g = df_.groupby("doc_id", as_index=False)["dl"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    dl_ds = salted_partition_apply(
        pos_index_ds.map_batches(dl_partial, batch_format="pyarrow"),
        lambda df: df.groupby("doc_id", as_index=False)["dl"].sum(),
        combine_key=lambda t: t["doc_id"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts).materialize()
    n_docs = dl_ds.count()
    if n_docs == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="float64")}))
    avgdl = float(dl_ds.sum("dl")) / n_docs

    # --- df / idf for the query terms (filter where postings live) ---
    def df_rows(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["term"], value_set=pa.array(want)))
        return pa.table({"term": hit["term"]})

    df_tbl = pos_index_ds.map_batches(df_rows, batch_format="pyarrow") \
        .to_pandas()
    dfs = df_tbl["term"].value_counts().to_dict()
    idf = {t: float(np.log(1.0 + (n_docs - dfs[t] + 0.5)
                           / (dfs[t] + 0.5)))
           for t in want if t in dfs}
    cfg = ray.put((idf, avgdl, adj_pairs))

    # --- candidate rows: query-term postings + their doc lengths ---
    def cand_rows(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["term"], value_set=pa.array(want)))
        # plain list<int64> BEFORE the join: the tensor-extension
        # re-typing won't survive hash_join's pandas round-trip
        pos = _plain_positions(hit["positions"])
        if pos.type != pa.list_(pa.int64()):
            pos = pc.cast(pos, pa.list_(pa.int64()))
        return pa.table({"term": hit["term"], "doc_id": hit["doc_id"],
                         "positions": pos})

    cand = hash_join(
        pos_index_ds.map_batches(cand_rows, batch_format="pyarrow"),
        dl_ds, on="doc_id", how="inner", n_parts=n_parts)

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        idf_map, avg, pairs = ray.get(cfg)
        ids, scores = [], []
        for did, grp in df.groupby("doc_id", sort=False):
            dl = float(grp["dl"].iloc[0])
            pos_of = {t_: np.asarray(p, dtype=np.int64)
                      for t_, p in zip(grp["term"], grp["positions"])}
            s = 0.0
            for t_, p in pos_of.items():
                w_idf = idf_map.get(t_)
                if w_idf is None:
                    continue
                tf = float(p.size)
                s += w_idf * tf * (k1 + 1) \
                    / (tf + k1 * (1 - b + b * dl / avg))
            for a, b_ in pairs:
                pa_, pb_ = pos_of.get(a), pos_of.get(b_)
                if pa_ is None or pb_ is None:
                    continue
                # min |x - y| of two sorted arrays: nearest-neighbor
                # probe of each a-position into b's positions
                i = np.searchsorted(pb_, pa_)
                best = np.full(pa_.size, np.iinfo(np.int64).max)
                left_ok = i > 0
                np.minimum(best, np.abs(
                    pa_ - pb_[np.clip(i - 1, 0, pb_.size - 1)]),
                    where=left_ok, out=best)
                right_ok = i < pb_.size
                np.minimum(best, np.abs(
                    pa_ - pb_[np.clip(i, 0, pb_.size - 1)]),
                    where=right_ok, out=best)
                dmin = int(best.min())
                if dmin <= window:
                    s += prox_weight * min(idf_map.get(a, 0.0),
                                           idf_map.get(b_, 0.0)) \
                        / (1.0 + dmin)
            if s > 0:
                ids.append(int(did))
                scores.append(round(s, 4))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                             "score": pd.Series(scores,
                                                dtype="float64")})

    scored = salted_partition_apply(
        cand, score_part,
        combine_key=lambda t: t["doc_id"].to_numpy(
            zero_copy_only=False).astype(np.int64),
        n_parts=n_parts)
    return scored.sort(["score", "doc_id"],
                       descending=[True, False]).limit(k)


def top_terms_positional(pos_index_ds, k: int) -> list[str]:
    """Top-k terms by (df desc, term asc) over the POSITIONAL index's
    digit-dropped token stream (one index row per (term, doc), so a
    per-term row count IS df). The deterministic pick ``near_search``'s
    driver query and its SQL oracle share — kept separate from
    ``top_terms`` because the boolean index counts digits as terms and
    the positional stream drops them.

    Salted partial-count form: the native groupby('term').Count paid
    per-distinct-group reduce overhead (9.4 s on the sf0.1 vocabulary
    — the map_groups-per-key anti-pattern the shuffle module
    documents; now ~1 s). Per-batch uniques → one term-functional
    exchange → per-part top-k → driver top-k over ≤ parts·k rows
    (exact: each term's global count lives wholly in one part)."""
    from .join import _key_to_int64
    from .shuffle import salted_partition_apply

    def partial(t: pa.Table) -> pa.Table:
        # arrow value_counts: no per-row Python objects (review
        # finding); null terms (possible from external pos-index
        # producers) drop — never a valid pick
        vc = t["term"].combine_chunks().value_counts()
        terms = vc.field("values")
        counts = pa.compute.cast(vc.field("counts"), pa.int64())
        keep = pa.compute.is_valid(terms)
        return pa.table({"term": terms.filter(keep),
                         "df": counts.filter(keep)})

    def part_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False)["df"].sum()
        return g.sort_values(["df", "term"],
                             ascending=[False, True]).head(k)

    tops = salted_partition_apply(
        pos_index_ds.map_batches(partial, batch_format="pyarrow"),
        part_top, lambda t: _key_to_int64(t, "term"),
        n_parts=16).to_pandas()
    tops = tops.sort_values(["df", "term"],
                            ascending=[False, True]).head(k)
    return tops["term"].tolist()


def near_search(pos_index_ds, term_a: str, term_b: str, window: int,
                n_parts: int = 64):
    """NEAR/w proximity search resolved entirely from the positional
    index: per-doc count of position pairs (pa, pb) with pa an
    occurrence of ``term_a``, pb of ``term_b``, and |pa - pb| <=
    ``window`` over the ``phrase_tokens`` stream — the classic
    unordered NEAR operator (Brin & Page's proximity signal; the
    reference's retrieval surface stops at keyword membership, this is
    the positional upgrade).

    Scale shape: the index filter keeps only the TWO query terms'
    rows, positions explode to flat (doc_id, slot, pos) ints, and ONE
    doc-functional salted exchange co-locates each doc's occurrences;
    the per-part pair count is a fully vectorized two-sided
    searchsorted over (doc-code << 32 | pos) composite keys — no
    per-doc Python loop, no corpus text read. Exchange volume is the
    two terms' postings only. Returns (doc_id, n_pairs) for docs with
    n_pairs > 0, sorted by doc_id."""
    import pyarrow.compute as pc

    from .shuffle import salted_partition_apply

    if term_a == term_b:
        raise ValueError("near_search wants two distinct terms")
    if window >= (1 << 31):
        raise ValueError("window must fit in int32")

    def explode_pos(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["term"], value_set=pa.array([term_a, term_b]))
        t = t.filter(mask)
        ids: list[int] = []
        slots: list[int] = []
        poss: list[int] = []
        for did, term, ps in zip(t["doc_id"].to_pylist(),
                                 t["term"].to_pylist(),
                                 t["positions"].to_pylist()):
            s = 0 if term == term_a else 1
            ids.extend([did] * len(ps))
            slots.extend([s] * len(ps))
            poss.extend(int(p) for p in ps)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "slot": pa.array(slots, pa.int8()),
            "pos": pa.array(poss, pa.int64()),
        })

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "n_pairs": pd.Series([], dtype="int64")})
        codes, uniq = pd.factorize(df["doc_id"].to_numpy())
        key = (codes.astype(np.int64) << 32) | df["pos"].to_numpy()
        is_a = (df["slot"].to_numpy() == 0)
        ka = key[is_a]
        kb = np.sort(key[~is_a])
        # a pos p matches b positions in [p-w, p+w]; the doc code in the
        # high bits keeps the range inside one doc (pos-w can't borrow:
        # pos >= 0 and w < 2^31 keep the low 32 bits non-negative after
        # clamping below)
        pa_ = ka & 0xFFFFFFFF
        base = ka - pa_
        lo = base + np.maximum(pa_ - window, 0)
        hi = base + pa_ + window
        n = (np.searchsorted(kb, hi, side="right")
             - np.searchsorted(kb, lo, side="left"))
        per_doc = np.bincount(codes[is_a], weights=n,
                              minlength=len(uniq)).astype(np.int64)
        keep = per_doc > 0
        return pd.DataFrame({"doc_id": np.asarray(uniq)[keep],
                             "n_pairs": per_doc[keep]})

    rows = pos_index_ds.map_batches(explode_pos, batch_format="pyarrow")
    return salted_partition_apply(
        rows, count_part,
        lambda t: t["doc_id"].to_numpy(zero_copy_only=False)
        .astype(np.int64),
        n_parts=n_parts).sort("doc_id")


def _term_parts(words: list, n_partitions: int) -> np.ndarray:
    """The ONE term→partition routing rule (word_hash64 mod n) shared
    by the sink, the merge and the pruned lookups — previously
    re-implemented at each site (review finding)."""
    from .textstats import word_hash64

    return np.fromiter(
        (word_hash64(w) % np.uint64(n_partitions) for w in words),
        dtype=np.uint64, count=len(words)).astype(np.int64)


def _layout_n_partitions(out_dir: str) -> int | None:
    import json
    import os

    meta = os.path.join(out_dir, "index_meta.json")
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return int(json.load(f)["n_partitions"])


def write_inverted_index(index_ds, out_dir: str, n_partitions: int = 64):
    """Persist the index as term-hash-partitioned parquet
    (``part=NN/*.parquet``): the resumable-sink shape — a failed build
    re-runs only missing partitions, and lookups read only the partition
    a term hashes to instead of scanning the whole index. The partition
    count is stamped into ``index_meta.json`` so maintenance ops can
    validate their routing against the layout they read."""
    import json
    import os

    def add_part(t: pa.Table) -> pa.Table:
        part = _term_parts(t["term"].to_pylist(), n_partitions)
        return t.append_column("part", pa.array(part))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index_meta.json"), "w") as f:
        json.dump({"n_partitions": n_partitions}, f)
    index_ds.map_batches(add_part, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def lookup_terms(out_dir: str, terms: list[str],
                 n_partitions: int = 64) -> pd.DataFrame:
    """Point lookups against a written index: hash each term to its
    partition and read ONLY those directories (partition pruning — the
    read cost is O(requested partitions), not O(index))."""
    import glob
    import os

    import pyarrow.parquet as pq

    from .textstats import word_hash64

    parts = sorted({int(word_hash64(t) % np.uint64(n_partitions))
                    for t in terms})
    want = set(terms)
    frames = []
    for p in parts:
        for f in glob.glob(os.path.join(out_dir, f"part={p}", "*.parquet")):
            t = pq.read_table(f, columns=["term", "df", "postings"])
            mask = pa.compute.is_in(t["term"],
                                    value_set=pa.array(sorted(want)))
            hit = t.filter(mask)
            if hit.num_rows:
                frames.append(hit.to_pandas())
    if not frames:
        return pd.DataFrame({"term": [], "df": [], "postings": []})
    return pd.concat(frames, ignore_index=True) \
        .sort_values("term").reset_index(drop=True)


def top_terms(index_ds, k: int) -> list[str]:
    """Top-k terms by (df desc, term asc) — the deterministic term pick
    the search query and its SQL oracle share."""
    top = index_ds.sort(["df", "term"], descending=[True, False]) \
                  .limit(k).to_pandas()
    return top["term"].tolist()


def search_and(index_ds, terms: list[str]):
    """Doc ids containing ALL of ``terms`` (conjunctive boolean search),
    as a Dataset of (doc_id) sorted asc. Postings explode where they
    live; the intersection is a count==k groupby, never a driver loop."""
    import ray
    from ray.data.aggregate import Count

    want = ray.put(frozenset(terms))
    k = len(set(terms))

    def explode(t: pa.Table) -> pa.Table:
        w = ray.get(want)
        out: list[int] = []
        for term, postings in zip(t["term"].to_pylist(),
                                  t["postings"].to_pylist()):
            if term in w:
                out.extend(postings)
        return pa.table({"doc_id": pa.array(out, pa.int64())})

    hits = index_ds.map_batches(explode, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Count(alias_name="n_terms"))

    def keep_all(t: pa.Table) -> pa.Table:
        mask = pa.compute.equal(t["n_terms"], k)
        return t.filter(mask).select(["doc_id"])

    return hits.map_batches(keep_all, batch_format="pyarrow") \
        .sort("doc_id")


def anchor_text_rollup(pages_ds, url_col: str = "url",
                       html_col: str = "html", n_parts: int = 16):
    """Anchor-text corpus over a pages table: (dst_url, anchor_text,
    n_refs) — what the rest of the web CALLS each page, the classic
    off-page retrieval/ranking signal search engines aggregate next to
    the on-page inverted index (and the reference's <a>-harvest walk,
    content_extractor.py's link handling, reused with the text kept).

    Scale shape: the DOM parse + anchor walk happens inside
    map_batches where the html lives; each batch PRE-AGGREGATES its
    (dst, text) pair counts (combiner), then ONE salted exchange keyed
    on a stable dst-url hash sums the counts where the target's rows
    land — the html never re-ships, no (page × anchor) row stream hits
    the driver. Returns a Dataset (dst_url, anchor_text, n_refs),
    target-scaled."""
    from ..functions.dom import fromstring
    from ..functions.extract import harvest_anchors_from_doc
    from .shuffle import salted_partition_apply

    def harvest(t: pa.Table) -> pa.Table:
        dsts: list[str] = []
        txts: list[str] = []
        for url, html in zip(t[url_col].to_pylist(),
                             t[html_col].to_pylist()):
            try:
                doc = fromstring(html)
            except Exception:
                continue                    # poisoned page ≠ dead block
            for dst, txt in harvest_anchors_from_doc(doc, url):
                dsts.append(dst)
                txts.append(txt)
        df = pd.DataFrame({"dst_url": dsts, "anchor_text": txts})
        agg = df.groupby(["dst_url", "anchor_text"], sort=False) \
            .size().reset_index(name="n_refs")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def dst_key(t: pa.Table) -> np.ndarray:
        vals = t["dst_url"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(vals)
        hashed = pd.util.hash_array(np.asarray(uniq, dtype=object)) \
            .astype(np.int64, copy=False)
        return hashed[codes]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["dst_url", "anchor_text"], sort=False,
                          as_index=False)["n_refs"].sum()

    return salted_partition_apply(
        pages_ds.map_batches(harvest, batch_format="pyarrow"),
        merge, dst_key, n_parts=n_parts)


def merge_inverted_index(old_dir: str, delta_ds, out_dir: str,
                         n_partitions: int = 64,
                         removed_doc_ids=None,
                         id_col: str = "doc_id", text_col: str = "text",
                         stats: dict | None = None) -> str:
    """Incremental index maintenance — the recrawl path: fold a DELTA
    corpus (new/re-fetched pages) into an existing term-hash-partitioned
    parquet index (write_inverted_index layout) without re-tokenizing
    or re-shuffling the full history.

    Cost shape: the only exchange is the delta's own index build
    (delta-scaled); each partition the delta touches is merged INSIDE a
    distributed task that reads just that ``part=NN`` directory and
    writes its merged successor (the same per-partition resumability as
    the sink — a killed merge re-runs only missing parts); partitions
    the delta never touches are straight file copies, no read. At a
    10^10-URL index a daily recrawl delta touches its own terms'
    partitions only, so maintenance cost tracks the delta, not the
    corpus.

    ``removed_doc_ids`` (recrawl tombstones): those ids drop from the
    BASE index's postings only — delta postings always survive. A
    RE-FETCHED page is therefore delta + its own id in
    ``removed_doc_ids`` (stale base postings for terms the new version
    lost are purged; fresh postings land), a pure deletion is a
    tombstone with no delta row, and a brand-new page is delta alone.
    (Filtering the base only is load-bearing: filtering the unioned
    lists stripped a re-fetched doc's NEW postings too — review
    finding.) Removals can hide in partitions the delta does not
    touch, so when given, every partition is processed (zero-row
    marker rows force the fan-out); terms whose postings empty out are
    dropped.

    Returns ``out_dir``. Gate (tests + registry): merged artifact ≡ the
    index built fresh over the union corpus (re-fetch case pinned in
    test_merge_inverted_index_refetch)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray

    from .textstats import word_hash64

    if os.path.abspath(old_dir) == os.path.abspath(out_dir):
        raise ValueError("out_dir must differ from old_dir")
    old_n = _layout_n_partitions(old_dir)
    if old_n is not None and old_n != n_partitions:
        # a 32-part base merged with %64 routing silently splits terms
        # across partitions and lookups then miss them (review finding)
        raise ValueError(
            f"old_dir was written with n_partitions={old_n}, "
            f"merge called with {n_partitions}")
    os.makedirs(out_dir, exist_ok=True)
    removed = (np.unique(np.asarray(list(removed_doc_ids), np.int64))
               if removed_doc_ids is not None else None)
    rref = ray.put(removed)

    delta_idx = build_inverted_index(delta_ds, id_col=id_col,
                                     text_col=text_col)

    def add_part(t: pa.Table) -> pa.Table:
        part = _term_parts(t["term"].to_pylist(), n_partitions)
        return t.append_column("part", pa.array(part))

    parted = delta_idx.map_batches(add_part, batch_format="pyarrow")
    if removed is not None:
        # tombstones may live in any partition — force full fan-out
        # (Arrow table with the delta index's exact schema: unioning a
        # pandas block against arrow blocks breaks the exchange)
        marker = pa.table({
            "term": pa.array([""] * n_partitions, pa.string()),
            "df": pa.array(np.zeros(n_partitions, np.int64)),
            "postings": pa.array([[] for _ in range(n_partitions)],
                                 pa.list_(pa.int64())),
            "part": pa.array(np.arange(n_partitions, dtype=np.int64))})
        import ray.data as rd

        parted = parted.union(rd.from_arrow(marker))
    parted = parted.materialize()

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        p = int(df["part"].iloc[0])
        df = df[df["term"] != ""]
        frames = [pq.read_table(f).to_pandas()
                  for f in sorted(glob.glob(
                      os.path.join(old_dir, f"part={p}", "*.parquet")))]
        rm = ray.get(rref)
        if rm is not None and frames:
            # tombstones purge the BASE side only (see docstring)
            for f in frames:
                f["postings"] = f["postings"].map(
                    lambda a: np.asarray(a, np.int64)[
                        ~np.isin(np.asarray(a, np.int64), rm)].tolist())
        both = pd.concat([*frames, df.drop(columns=["part"])],
                         ignore_index=True) if frames else \
            df.drop(columns=["part"])

        def combine(lists) -> np.ndarray:
            return np.unique(np.concatenate(
                [np.asarray(x, np.int64) for x in lists]))

        g = both.groupby("term", sort=True)["postings"].agg(combine)
        out = pd.DataFrame({
            "term": g.index,
            "df": g.map(len).astype("int64"),
            "postings": g.map(lambda a: a.tolist()).values,
        }).reset_index(drop=True)
        out = out[out["df"] > 0]
        pdir = os.path.join(out_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(pa.Table.from_pandas(out, preserve_index=False),
                       os.path.join(pdir, "merged.parquet"))
        return pd.DataFrame({"part": pd.Series([p], dtype="int64"),
                             "n_terms": pd.Series([len(out)],
                                                  dtype="int64")})

    receipts = parted.groupby("part").map_groups(
        merge_part, batch_format="pandas").to_pandas()
    # empty delta + no tombstones → zero-column frame (review finding):
    # nothing touched, every partition is a straight copy
    touched = (set(receipts["part"].tolist())
               if "part" in receipts.columns else set())
    copied = 0
    for d in sorted(glob.glob(os.path.join(old_dir, "part=*"))):
        p = int(os.path.basename(d).split("=")[1])
        if p not in touched:
            shutil.copytree(d, os.path.join(out_dir, f"part={p}"),
                            dirs_exist_ok=True)
            copied += 1
    if stats is not None:
        stats["touched_parts"] = len(touched)
        stats["copied_parts"] = copied
    return out_dir
