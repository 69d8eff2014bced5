"""Distributed BPE training (Sennrich et al. 2016, arXiv:1508.07909) —
the real version of the engine's "BPE-ish" token counting: learn merge
rules from corpus statistics, Ray-Data-first.

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus: one
streamed pass reduces the corpus to distinct (word, freq) rows, and every
merge iteration then touches only that table. That is the scale shape —
at 100 TB the corpus is ~10^11 words but the distinct-word table is
~10^8 rows, lives as a Dataset across workers, and each merge is two
small map_batches passes over it:

  1. pair counting: per batch, adjacent-symbol-pair counts weighted by
     word freq → partial (a, b, count) rows; reduced adaptively (driver
     numpy below ``pairs_driver_limit``, one salted exchange keyed on
     the pair above it — the kmeans_fit pattern) → global argmax pair
     with a canonical tie-break (count desc, then (a, b) lexicographic),
     so training is deterministic at any parallelism.
  2. merge application: rows whose symbol string contains the pair are
     prefiltered VECTORIZED (pandas str.contains on a joined form);
     only those rewrite their symbol sequence. The per-word rewrite loop
     is over the distinct-word table (vocabulary-scaled, never
     corpus-scaled) — the standard algorithm's working set.

Pre-tokenization is intentionally plain ``[a-z]+`` over lowercased text
(NOT the reference's split_words): it is exactly reproducible in the
DuckDB oracle via regexp_extract_all, so the word-table half of training
is value-checked end to end.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"[a-z]+")
END = "</w>"


def word_freqs(ds, text_col: str = "text", n_parts: int = 32):
    """Distinct (word, freq) over the corpus: per-batch Counter partials,
    one salted exchange on a stable word hash, per-part vectorized sum.
    The corpus never leaves its pass; the output is vocabulary-scaled."""
    from .shuffle import salted_partition_apply

    def partials(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t[text_col].to_pylist():
            if not isinstance(txt, str):
                continue
            for w in _WORD_RE.findall(txt.lower()):
                counts[w] = counts.get(w, 0) + 1
        return pa.table({
            "word": pa.array(list(counts.keys()), pa.string()),
            "freq": pa.array(list(counts.values()), pa.int64())})

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("word", sort=True, as_index=False)["freq"].sum()

    def word_key(t: pa.Table) -> np.ndarray:
        h = pd.util.hash_array(np.asarray(t["word"].to_pylist(),
                                          dtype=object))
        return h.view(np.int64)

    return salted_partition_apply(
        ds.map_batches(partials, batch_format="pyarrow"),
        reduce_part, word_key, n_parts=n_parts)


def _pair_partials(t: pa.Table) -> pa.Table:
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in zip(t["syms"].to_pylist(), t["freq"].to_pylist()):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    if not counts:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    a, b = zip(*counts.keys())
    return pa.table({"a": pa.array(list(a), pa.string()),
                     "b": pa.array(list(b), pa.string()),
                     "count": pa.array(list(counts.values()), pa.int64())})


def _select_merge_batch(parts: pd.DataFrame, n_max: int,
                        min_pair_freq: int) -> list[tuple[str, str, int]]:
    """Pick the largest batch of merges applicable in ONE distributed
    round that is provably identical to running them sequentially.

    Selection: walk the snapshot's canonical order (count desc, then
    (a, b) lex — the sequential tie-break) and take pairs while each is
    symbol-disjoint from everything taken and its merged output is a
    string that exists neither in the snapshot's symbol alphabet nor
    among the other outputs; STOP at the first pair excluded for any
    reason (count ``c_Q``), then trim the batch to counts strictly
    above ``c_Q``.

    Why this equals sequential BPE exactly:
    - batch pairs are mutually disjoint, so applying one neither
      creates nor destroys occurrences of another — their counts at
      every intermediate sequential step equal the snapshot counts;
    - every snapshot pair NOT in the batch ranks canonically after the
      stop point; applying batch merges can only shrink such a pair's
      count (growth would need a new adjacency, i.e. a merged output
      string-equal to one of its symbols — excluded by the alphabet
      check), so it still ranks after every remaining batch element;
    - a CREATED pair (x, ab) / (ab, y) needs x (resp. y) adjacent to
      the merged site, so its count is bounded by the snapshot count of
      (x, a) (resp. (b, y)) — pairs that share a symbol with the batch,
      hence excluded, hence counted ≤ c_Q; the strict trim puts every
      remaining batch element above that bound (ties included). The
      ONE exception is a self-adjacent pair (a == b), whose created
      pair is bounded by the batch pair ITSELF — so a self-adjacent
      pair always TERMINATES its batch (taken, then stop), keeping the
      bound argument intact for everything that runs in one round.
    Therefore at each intermediate step the canonical argmax over
    {remaining batch, other existing, created} is the next batch
    element — the sequential trainer would pick exactly this sequence.
    The fallback batch of one IS a sequential step, so progress and
    exactness hold unconditionally."""
    if parts.empty:
        return []
    g = parts.groupby(["a", "b"], sort=False, as_index=False)["count"].sum()
    g = g.sort_values(["count", "a", "b"],
                      ascending=[False, True, True], kind="mergesort")
    snapshot_syms = set(g["a"]) | set(g["b"])
    taken: list[tuple[str, str, int]] = []
    used: set[str] = set()
    outs: set[str] = set()
    c_q = min_pair_freq - 1   # nothing excluded yet: only the floor binds
    for a, b, cnt in g.itertuples(index=False):
        a, b, cnt = str(a), str(b), int(cnt)
        if cnt < min_pair_freq:
            break             # below floor: sequential would stop here too
        ab = a + b
        if (len(taken) >= n_max or a in used or b in used
                or ab in snapshot_syms or ab in outs):
            c_q = cnt
            break
        taken.append((a, b, cnt))
        used.update((a, b))
        outs.add(ab)
        if a == b:
            # the disjointness proof's one hole (review-confirmed
            # counterexample): merging a SELF-adjacent pair creates
            # (ab, a)/(a, ab) whose count is bounded by THIS pair's
            # count, not by c_Q — e.g. words {bbb:9, …}: created
            # (bb, b)=9 outranks a later batch member (c, c)=5 in the
            # sequential order. Ending the batch here restores exact
            # parity: earlier members are applied before the created
            # pair exists, later candidates compete against it in the
            # NEXT distributed round at its true count.
            break
    kept = [t for t in taken if t[2] > c_q]
    if kept:
        return kept
    # a batch of ONE is a plain sequential step — exact even when the
    # top pair failed the batching checks (alphabet collision, trim)
    top = g.iloc[0]
    a, b, cnt = str(top["a"]), str(top["b"]), int(top["count"])
    return [(a, b, cnt)] if cnt >= min_pair_freq else []


def bpe_train(ds, n_merges: int = 30, text_col: str = "text",
              min_pair_freq: int = 2, pairs_driver_limit: int = 2_000_000,
              n_parts: int = 32, max_round_merges: int = 64,
              stats: dict | None = None):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (merges, n_distinct_words) where merges is the ordered list of
    (a, b, count) rules, bit-identical to the sequential trainer.
    Early-stops when the best pair's count drops below
    ``min_pair_freq``.

    Each distributed round applies a BATCH of provably-commuting merges
    (``_select_merge_batch``) instead of one, so a realistic 32k-vocab
    train is hundreds of count exchanges, not 32k; ``max_round_merges``
    caps the batch. ``stats`` (optional) gets ``rounds``."""
    from .shuffle import salted_partition_apply

    wf = word_freqs(ds, text_col=text_col, n_parts=n_parts)

    def to_symbols(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        syms = [list(w) + [END] for w in words]
        return pa.table({
            "word": t["word"], "freq": t["freq"],
            "syms": pa.array(syms, pa.list_(pa.string()))})

    words_ds = wf.map_batches(to_symbols, batch_format="pyarrow") \
        .materialize()
    n_words = words_ds.count()
    n_blocks = max(1, words_ds.num_blocks())

    def pair_key(t: pa.Table) -> np.ndarray:
        ha = pd.util.hash_array(np.asarray(t["a"].to_pylist(), dtype=object))
        hb = pd.util.hash_array(np.asarray(t["b"].to_pylist(), dtype=object))
        with np.errstate(over="ignore"):
            return (ha * np.uint64(0x9E3779B97F4A7C15) + hb).view(np.int64)

    def reduce_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["a", "b"], sort=True,
                          as_index=False)["count"].sum()

    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        pair_ds = words_ds.map_batches(_pair_partials,
                                       batch_format="pyarrow")
        # adaptive reduce (kmeans_fit pattern): the partials bound is
        # n_blocks × distinct-pairs-per-block; pre-reduce via one salted
        # exchange when it could outgrow the driver
        if n_blocks * 4096 > pairs_driver_limit:
            pair_ds = salted_partition_apply(pair_ds, reduce_pairs,
                                             pair_key, n_parts=n_parts)
        batch = _select_merge_batch(pair_ds.to_pandas(),
                                    n_max=min(max_round_merges,
                                              n_merges - len(merges)),
                                    min_pair_freq=min_pair_freq)
        if not batch:
            break
        rounds += 1
        merges.extend(batch)
        pair2out = {(a, b): a + b for a, b, _ in batch}
        # \x1f (unit separator) — can't appear in [a-z]+/</w> symbols;
        # NOT \x00: numpy truncates a scalar at NUL when broadcasting
        # scalar+Series, silently dropping the boundary sentinel
        joined = [f"\x1f{a}\x1f{b}\x1f" for a, b, _ in batch]

        def apply_batch(df: pd.DataFrame, pair2out=pair2out,
                        joined=joined) -> pd.DataFrame:
            # vectorized prefilter: only words whose sep-joined symbol
            # string contains some batch pair rewrite their sequence
            flat = ("\x1f" + df["syms"].map("\x1f".join) + "\x1f")
            hit = flat.str.contains(joined[0], regex=False)
            for j in joined[1:]:
                hit |= flat.str.contains(j, regex=False)
            if hit.any():
                # one left-to-right pass applies every batch pair: the
                # pairs are symbol-disjoint, so greedy scanning equals
                # applying them one-by-one in any order
                def rewrite(syms: list[str]) -> list[str]:
                    out, i, n = [], 0, len(syms)
                    while i < n:
                        ab = pair2out.get((syms[i], syms[i + 1])) \
                            if i + 1 < n else None
                        if ab is not None:
                            out.append(ab)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    return out

                df = df.copy()
                df.loc[hit, "syms"] = df.loc[hit, "syms"].map(rewrite)
            # arrow can't convert ndarray-of-object cells (the
            # arrow→pandas round trip of list<string>) back to
            # list<string>; normalize every cell to a plain list
            df["syms"] = df["syms"].map(list)
            return df

        words_ds = words_ds.map_batches(
            apply_batch, batch_format="pandas").materialize()
    if stats is not None:
        stats["rounds"] = rounds
    return merges, n_words


def bpe_vocab(merges: list[tuple[str, str, int]]) -> list[str]:
    """The learned subword units, in merge order."""
    return [a + b for a, b, _ in merges]


class BpeTokenizer:
    """Stateful apply stage: the learned merge table loads ONCE per actor
    in ``__init__`` (rank dict — the standard greedy lowest-rank-first
    application), ``__call__`` tokenizes one Arrow batch. The genuine
    actor-pool case (contrast kmeans' per-iteration broadcast): the
    merge table is fixed for the whole pass and per-word results are
    memoized across batches in actor state, so each distinct word is
    tokenized once per actor, not once per occurrence."""

    def __init__(self, merges: list[tuple[str, str, int]] | None = None,
                 merges_ref=None):
        import ray

        m = merges if merges is not None else ray.get(merges_ref)
        self.ranks = {(a, b): i for i, (a, b, _) in enumerate(m)}
        self.cache: dict[str, int] = {}

    def _n_tokens(self, word: str) -> int:
        hit = self.cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [END]
        while len(syms) > 1:
            best_rank, best_i = None, -1
            for i in range(len(syms) - 1):
                r = self.ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        n = len(syms)
        self.cache[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = []
        for txt in batch["text"].to_pylist():
            words = _WORD_RE.findall(txt.lower()) \
                if isinstance(txt, str) else []
            counts.append(sum(self._n_tokens(w) for w in words))
        return pa.table({
            "doc_id": batch["doc_id"],
            "bpe_tokens": pa.array(counts, pa.int64())})


def bpe_token_counts(ds, merges: list[tuple[str, str, int]]):
    """Per-doc subword token counts under the learned merges — merge
    table broadcast once (ray.put), actor pool for the per-word memo."""
    import ray

    mref = ray.put(merges)
    return ds.map_batches(
        BpeTokenizer, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_kwargs={"merges_ref": mref})
