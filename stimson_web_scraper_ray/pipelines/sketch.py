"""Mergeable sketch operators — approximate distinct counts and heavy
hitters at 100-TB scale.

Exact distinct aggregation (``event_type_distinct_users``) pays one
all-to-all exchange of every (group, key) pair; exact top-k over an
unbounded vocabulary (``corpus_top_keywords``) shuffles the full vocab.
Both have sketch forms whose exchange volume is *constant per block*:

- **HyperLogLog** (Flajolet et al. 2007): per-batch, per-group register
  arrays (2^p uint8 registers) merged by elementwise max — a commutative
  idempotent merge, so partials combine in any order and the exchange
  carries ``n_blocks x n_groups`` fixed-size rows instead of one row per
  distinct key. Standard error ~ 1.04/sqrt(2^p) (1.6% at p=12).

- **Heavy hitters, two-pass exact**: pass 1 keeps each batch's top-k'
  words (a valid candidate generator: an item with global freq >= N/k'
  has per-batch freq >= B/k' in some batch, and at most k' items in a
  batch can reach B/k', so every global heavy hitter survives in some
  batch's top-k'); pass 2 recounts ONLY the candidate set exactly via a
  broadcast membership (ray.put once, read per task) and takes top-k.
  The result is provably exact whenever the returned k-th count >=
  N/k' — checked at runtime — so the sketch path can share the exact
  DuckDB oracle of the brute-force form.

No reference counterpart (the reference is single-document scope); these
are the driver-mandated large-scale-pipeline additions, same tier as the
dedup family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .shuffle import salted_partition_apply

# ---------------------------------------------------------------------------
# splitmix64 — vectorized 64-bit finalizer (public-domain constants),
# uniform enough for HLL bucketing of sequential int64 ids.
# ---------------------------------------------------------------------------

_SM_C1 = np.uint64(0x9E3779B97F4A7C15)
_SM_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + _SM_C1
    z = (z ^ (z >> np.uint64(30))) * _SM_C2
    z = (z ^ (z >> np.uint64(27))) * _SM_C3
    return z ^ (z >> np.uint64(31))


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def _bucket_ranks(values: np.ndarray, p: int):
    """(bucket, rank) vectors shared by the whole-array and sharded
    register builders: bucket = top p hash bits, rank = 1 + leading
    zeros of the remaining 64-p bits (sentinel-capped)."""
    h = splitmix64(values)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel ones
    # rank = 1 + count of leading zeros in the top 64-p bits of `rest`
    # (sentinel guarantees a set bit, so log2 is safe and caps the rank)
    fl = np.floor(np.log2(rest.astype(np.float64) + 1.0))
    lead = np.uint8(63) - fl.astype(np.uint8)
    return bucket, lead + np.uint8(1)


def hll_registers(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register array (2^p uint8) for one batch of int64 keys."""
    bucket, rank = _bucket_ranks(values, p)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Classic HLL estimator with linear-counting small-range correction
    (Flajolet et al. 2007 Fig. 3; alpha_m for m >= 128)."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def hll_group_registers(ds, group_col: str, value_col: str,
                        p: int = 12, n_parts: int = 16) -> pd.DataFrame:
    """Merged HLL register arrays per group: one streamed pass building
    per-batch per-group registers, then a salted max-merge exchange
    keyed on the group. Exchange volume is n_blocks × n_groups fixed
    2^p-byte rows; the returned frame is n_groups rows of (group,
    regs:bytes) — group-scaled, the shared building block for the
    distinct estimator and for register-algebra consumers (union /
    inclusion-exclusion overlap)."""

    def partial(t: pa.Table) -> pa.Table:
        groups = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_g, out_r = [], []
        for g in pd.unique(groups):
            out_g.append(g)
            out_r.append(hll_registers(vals[groups == g], p=p).tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "regs": pa.array(out_r, pa.binary())})

    def group_key(t: pa.Table) -> np.ndarray:
        # process-stable partition key (Python str hash is
        # PYTHONHASHSEED-randomized per worker); hash uniques only.
        import hashlib
        groups = t[group_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(groups)
        hashed = np.asarray(
            [int.from_bytes(hashlib.blake2b(str(g).encode("utf-8"),
                                            digest_size=8).digest(),
                            "little") & 0x7FFFFFFF for g in uniq],
            dtype=np.int64)
        return hashed[codes]

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for blob in sub["regs"]:
                regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
            rows.append((g, regs.tobytes()))
        return pd.DataFrame(rows, columns=[group_col, "regs"])

    merged = salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge_part, group_key, n_parts=n_parts).to_pandas()
    # ≤ one row per (group, part) survives the exchange; final
    # max-merge on the driver over the group-scaled remainder
    out = merged.groupby(group_col, sort=False)["regs"].apply(
        lambda blobs: bytes(
            np.maximum.reduce([np.frombuffer(b, dtype=np.uint8)
                               for b in blobs]))
    ).reset_index(name="regs")
    return out.sort_values(group_col).reset_index(drop=True)


def hll_distinct_per_group(ds, group_col: str, value_col: str,
                           p: int = 12, n_parts: int = 16):
    """Approximate COUNT(DISTINCT value) per group over the merged
    register table (see hll_group_registers for the exchange shape).

    Returns a pandas DataFrame (group_col, approx_distinct:int64) —
    n_groups rows, small by construction."""
    regs = hll_group_registers(ds, group_col, value_col, p=p,
                               n_parts=n_parts)
    out = regs.copy()
    out["approx_distinct"] = [
        int(round(hll_estimate(np.frombuffer(b, dtype=np.uint8))))
        for b in out.pop("regs")]
    out["approx_distinct"] = out["approx_distinct"].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def hll_distinct_sharded(ds, group_col: str, value_col: str,
                         p: int = 16, shard_bits: int = 3,
                         n_parts: int = 16):
    """Sharded-by-prefix HLL distinct count — the >node-memory form of
    ``hll_distinct_per_group``. The 2^p register array is PARTITIONED
    by its top ``shard_bits`` bucket bits into 2^shard_bits shards;
    each shard's registers are built, exchanged, and max-merged
    independently (keyed on (group, shard)), and only TWO SCALARS per
    shard ever reach the driver: sum(2^-reg) and the zero-register
    count. The full array therefore never exists in any one place —
    at p=20+ (0.1% error) or with millions of groups, no actor or
    driver ever holds more than m / 2^shard_bits registers per group,
    and a bigger cluster just raises shard_bits.

    The estimate is numerically the classic estimator over the same
    registers (hll_estimate's formula folded over per-shard partial
    sums), so it agrees with the unsharded path to FP-summation order.
    Returns pandas (group_col, approx_distinct:int64)."""
    m = 1 << p
    n_shards = 1 << shard_bits
    m_s = m >> shard_bits
    if m_s < 1:
        raise ValueError("shard_bits must be < p")

    def partial(t: pa.Table) -> pa.Table:
        groups = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_g, out_s, out_r = [], [], []
        for g in pd.unique(groups):
            bucket, rank = _bucket_ranks(vals[groups == g], p)
            shard = bucket >> (p - shard_bits)
            local = bucket & (m_s - 1)
            for s in np.unique(shard):
                mask = shard == s
                regs = np.zeros(m_s, dtype=np.uint8)
                np.maximum.at(regs, local[mask], rank[mask])
                out_g.append(g)
                out_s.append(int(s))
                out_r.append(regs.tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "shard": pa.array(out_s, pa.int64()),
                         "regs": pa.array(out_r, pa.binary())})

    def gs_key(t: pa.Table) -> np.ndarray:
        import hashlib
        groups = t[group_col].to_numpy(zero_copy_only=False)
        shards = t["shard"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(groups)
        hashed = np.asarray(
            [int.from_bytes(hashlib.blake2b(str(g).encode("utf-8"),
                                            digest_size=8).digest(),
                            "little") & 0x7FFFFFFF for g in uniq],
            dtype=np.int64)
        return hashed[codes] * np.int64(n_shards) + shards

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (g, s), sub in df.groupby([group_col, "shard"], sort=False):
            regs = np.zeros(m_s, dtype=np.uint8)
            for blob in sub["regs"]:
                regs = np.maximum(regs,
                                  np.frombuffer(blob, dtype=np.uint8))
            rows.append((g, s,
                         float(np.sum(np.exp2(-regs.astype(np.float64)))),
                         int(np.count_nonzero(regs == 0))))
        return pd.DataFrame(rows, columns=[group_col, "shard",
                                           "inv_sum", "n_zero"])

    scalars = salted_partition_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge_part, gs_key, n_parts=n_parts).to_pandas()

    # the exchange is key-functional (one part per (group, shard)), so
    # each pair contributes exactly one scalar row; shards with NO
    # input rows are m_s all-zero registers (inv_sum = m_s, n_zero =
    # m_s) folded in arithmetically below
    agg = scalars.groupby(group_col, sort=False).agg(
        inv_sum=("inv_sum", "sum"), n_zero=("n_zero", "sum"),
        n_present=("shard", "size")).reset_index()
    missing = (n_shards - agg["n_present"]).to_numpy()
    inv = agg["inv_sum"].to_numpy() + missing * float(m_s)
    zeros = agg["n_zero"].to_numpy() + missing * m_s
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / inv
    small = est <= 2.5 * m
    lc = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)),
                  est)
    est = np.where(small, lc, est)
    out = pd.DataFrame({
        group_col: agg[group_col],
        "approx_distinct": np.round(est).astype(np.int64)})
    return out.sort_values(group_col).reset_index(drop=True)


def hll_pair_overlap(ds, group_col: str, value_col: str, p: int = 12,
                     n_parts: int = 16,
                     bound_frac: float = 0.08) -> pd.DataFrame:
    """Set-algebra over HLL sketches: estimated |A∩B| for every
    unordered group pair via inclusion-exclusion (est_a + est_b −
    est_union, union = register max-merge), PLUS the exact pair
    intersection for the correctness gate. Pairwise by definition, so
    intended for small group universes (event types, languages, source
    buckets — ≤ ~16); values scale freely.

    Exact side stays distributed and vectorized: one salted exchange
    on the VALUE (each value's rows co-locate), then per part a
    factorize → per-value membership BITMASK (np.bitwise_or.at), a
    bincount over mask patterns, and pair counts summed over patterns
    containing both bits — per-part output is ≤ C(groups,2) rows, the
    driver sums those partials. No (value × pair) row ever ships.

    ``within_bound`` gates |est∩ − exact∩| ≤ bound_frac × est_union +
    3·σ_lc, where σ_lc covers the linear-counting regime's absolute
    noise floor; with p=12 the standard error per sketch is ~1.6%, so
    the inclusion-exclusion error is ≤ ~2.8% of the union (√3 combined)
    and 0.08 ≈ 3σ. Returns (group_a, group_b, n_common:int64,
    within_bound:bool) sorted."""
    from itertools import combinations

    regs_df = hll_group_registers(ds, group_col, value_col, p=p,
                                  n_parts=n_parts)
    regs = {g: np.frombuffer(b, dtype=np.uint8)
            for g, b in zip(regs_df[group_col], regs_df["regs"])}
    est = {g: hll_estimate(r) for g, r in regs.items()}

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"group_a": [], "group_b": [], "n": []})
        gcodes, gups = pd.factorize(df[group_col], sort=True)
        if len(gups) > 32:
            raise ValueError("hll_pair_overlap: >32 groups — pairwise "
                             "overlap is quadratic in groups by design")
        vcodes, _ = pd.factorize(df[value_col])
        masks = np.zeros(vcodes.max() + 1 if len(vcodes) else 0,
                         dtype=np.uint32)
        np.bitwise_or.at(masks, vcodes,
                         np.uint32(1) << gcodes.astype(np.uint32))
        pattern_counts = np.bincount(masks)
        patterns = np.arange(len(pattern_counts), dtype=np.uint32)
        rows = []
        for i, j in combinations(range(len(gups)), 2):
            both = np.uint32((1 << i) | (1 << j))
            n = int(pattern_counts[(patterns & both) == both].sum())
            if n:
                rows.append((gups[i], gups[j], n))
        return pd.DataFrame(rows, columns=["group_a", "group_b", "n"])

    def value_key(t: pa.Table) -> np.ndarray:
        return t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)

    parts = salted_partition_apply(
        ds.select_columns([group_col, value_col]),
        pair_partial, value_key, n_parts=n_parts).to_pandas()
    exact = parts.groupby(["group_a", "group_b"], sort=True,
                          as_index=False)["n"].sum()

    m = 1 << p
    sigma_lc = np.sqrt(m) * 3.0          # linear-counting noise floor
    rows = []
    for a, b in combinations(sorted(regs), 2):
        u = hll_estimate(hll_merge(regs[a], regs[b]))
        common_est = est[a] + est[b] - u
        hit = exact[(exact["group_a"] == a) & (exact["group_b"] == b)]
        n_exact = int(hit["n"].iloc[0]) if len(hit) else 0
        ok = abs(common_est - n_exact) <= bound_frac * u + sigma_lc
        rows.append((a, b, n_exact, bool(ok)))
    out = pd.DataFrame(rows, columns=["group_a", "group_b", "n_common",
                                      "within_bound"])
    out["n_common"] = out["n_common"].astype("int64")
    return out.sort_values(["group_a", "group_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Heavy hitters — candidate generation + exact recount
# ---------------------------------------------------------------------------


def heavy_hitter_words(ds, k: int = 20, k_prime: int = 256,
                       text_col: str = "text"):
    """Exact corpus top-k words via the two-pass sketch path (module
    docstring). Tokenization matches ``corpus_top_keywords`` /
    keywords_top10 (split_words, drop numerics, no stopwords) so the
    same DuckDB oracle applies; tie-break (freq desc, word desc) matches
    article.py:446-450's sort.

    Returns (word, freq) pandas of k rows. Raises if the provable-exact
    condition fails (k-th count < N/k') — raise k_prime in that case."""
    import ray

    from .textstats import partial_word_counts

    def batch_topk(t: pa.Table) -> pa.Table:
        counts = partial_word_counts(t, text_col=text_col, stop_lang=None)
        df = counts.to_pandas().nlargest(k_prime, "freq", keep="all")
        return pa.table({
            "word": pa.array(df["word"], pa.string()),
            "freq": pa.array(df["freq"].to_numpy(np.int64), pa.int64()),
        })

    cand_df = ds.map_batches(batch_topk, batch_format="pyarrow").to_pandas()
    # candidate set: every word in any batch's top-k' (the exactness
    # guarantee needs the full union). Bounded by n_blocks x k'; at
    # cluster scale feed blocks of >= 10^5 docs so this stays ~10^6.
    candidates = frozenset(cand_df["word"])
    cand_ref = ray.put(candidates)

    # split_words tokens never contain NUL, so this key cannot collide
    # with a real word; it carries each batch's exact token total through
    # the same groupby/Sum that recounts the candidates, giving exact N.
    _N_KEY = "\x00__total_tokens__"

    def recount(t: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        counts = partial_word_counts(t, text_col=text_col, stop_lang=None)
        df = counts.to_pandas()
        n = int(df["freq"].sum())
        df = df[df["word"].isin(cand)]
        return pa.table({
            "word": pa.array(list(df["word"]) + [_N_KEY], pa.string()),
            "freq": pa.array(
                list(df["freq"].to_numpy(np.int64)) + [n], pa.int64()),
        })

    from ray.data.aggregate import Sum

    counted = ds.map_batches(recount, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("freq", alias_name="freq")) \
        .to_pandas()
    is_total = counted["word"] == _N_KEY
    n_total = int(counted.loc[is_total, "freq"].sum())
    counted = counted[~is_total]
    top = counted.sort_values(["freq", "word"], ascending=[False, False]) \
        .head(k).reset_index(drop=True)
    top["freq"] = top["freq"].astype("int64")
    if len(top) == k and n_total and int(top["freq"].iloc[-1]) * k_prime \
            < n_total:
        raise ValueError(
            f"heavy_hitter_words not provably exact: kth count "
            f"{int(top['freq'].iloc[-1])} < N/k' = {n_total / k_prime:.0f}"
            " — raise k_prime")
    return top[["word", "freq"]]


def kmv_bottomk(ds, k: int = 64, id_col: str = "doc_id"):
    """KMV (k-minimum-values) sketch: the k ids with the globally
    smallest md5 hash, plus the standard (k-1)/h_(k) distinct-count
    estimate (Bar-Yossef et al. 2002). The hash is md5 of the decimal id
    string, low 8 bytes little-endian — bit-compatible with DuckDB's
    ``md5_number_lower(CAST(id AS VARCHAR))`` (the corpus_mix hash), so
    the sample membership AND the estimate are oracle-exact.

    Scale shape: each batch emits only its local bottom-k (a combiner —
    the exchange carries k rows per block, never the id stream); the
    global bottom-k is a k-row sort+limit. The bottom-k set doubles as a
    deterministic, mergeable uniform sample (resumable: re-runs pick
    identical rows), the KMV analogue of the HLL registers above.
    Returns k rows (rank, id_col, kmv_estimate) ordered by rank."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        h = np.empty(len(ids), dtype=np.uint64)
        for i, v in enumerate(ids):
            d = hashlib.md5(str(v).encode("ascii")).digest()
            h[i] = int.from_bytes(d[8:16], "little")
        take = min(k, len(ids))
        idx = np.argsort(h, kind="stable")[:take]
        return pa.table({
            # typed id column: bare pa.array([...]) on an EMPTY batch
            # infers null and breaks the sort's schema unification
            # (review finding)
            id_col: pa.array([ids[i] for i in idx],
                             type=batch[id_col].type),
            "hv": pa.array(h[idx], pa.uint64()),
        })

    top = ds.map_batches(partial, batch_format="pyarrow") \
        .sort(["hv", id_col]).limit(k).to_pandas()
    if top.empty:           # empty dataset (review finding: iloc crash)
        return pd.DataFrame({
            "rank": pd.Series(dtype="int64"),
            id_col: pd.Series(dtype=object),
            "kmv_estimate": pd.Series(dtype="float64")})
    hk = float(top["hv"].iloc[-1]) / float(1 << 64)
    est = round((len(top) - 1) / hk, 4) if hk > 0 else float("inf")
    return pd.DataFrame({
        "rank": pd.array(np.arange(1, len(top) + 1), dtype="int64"),
        id_col: top[id_col].to_numpy(),
        "kmv_estimate": np.full(len(top), est, dtype=np.float64),
    })


# --- count-min sketch ---------------------------------------------------------


_CMS_SEEDS = np.arange(1, 17, dtype=np.uint64) * np.uint64(0xA54FF53A5F1D36F1)


def _cms_cells(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n,) uint64 word hashes → (d, n) int32 column indices, row i
    keyed by splitmix64(h ^ seed_i)."""
    cols = np.empty((d, len(hashes)), dtype=np.int64)
    for i in range(d):
        cols[i] = (splitmix64(hashes ^ _CMS_SEEDS[i])
                   % np.uint64(w)).astype(np.int64)
    return cols


def _word_hashes(words: list[str]) -> np.ndarray:
    import hashlib

    return np.asarray(
        [int.from_bytes(hashlib.blake2b(w.encode("utf-8"),
                                        digest_size=8).digest(), "little")
         for w in words], dtype=np.uint64)


def cms_build(ds, text_col: str = "text", d: int = 5, w: int = 4096):
    """Distributed count-min sketch over corpus words (Cormode &
    Muthukrishnan 2005): each batch folds its word counts into a dense
    d×w int64 grid and emits only the NONZERO cells — so the exchange
    carries ≤ d·w fixed-size rows per block regardless of corpus size —
    then one tiny groupby(cell).sum merges them (CMS is linear). The
    merged table is ≤ d·w rows; pulling it to the driver is O(sketch),
    never O(corpus), the same contract as the HLL register pull.

    Returns (M: np.ndarray (d, w) int64, n_total_tokens: int).
    """
    from ray.data.aggregate import Sum

    from .lm import ascii_words

    def partial(t: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for txt in t[text_col].to_pylist():
            for word in ascii_words(txt):
                counts[word] = counts.get(word, 0) + 1
        grid = np.zeros((d, w), dtype=np.int64)
        if counts:
            freqs = np.fromiter(counts.values(), dtype=np.int64,
                                count=len(counts))
            cols = _cms_cells(_word_hashes(list(counts)), d, w)
            for i in range(d):
                np.add.at(grid[i], cols[i], freqs)
        flat = grid.ravel()
        nz = np.flatnonzero(flat)
        return pa.table({"cell": pa.array(nz, pa.int64()),
                         "cnt": pa.array(flat[nz], pa.int64()),
                         "toks": pa.array(
                             [int(freqs.sum()) if counts else 0]
                             + [0] * (len(nz) - 1) if len(nz) else [],
                             pa.int64())})

    cells = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("cell").aggregate(Sum("cnt", alias_name="cnt"),
                                   Sum("toks", alias_name="toks")) \
        .to_pandas()
    M = np.zeros(d * w, dtype=np.int64)
    M[cells["cell"].to_numpy()] = cells["cnt"].to_numpy()
    return M.reshape(d, w), int(cells["toks"].sum())


def cms_estimate(M: np.ndarray, words: list[str]) -> np.ndarray:
    """Point-query min over the d rows — never underestimates."""
    d, w = M.shape
    cols = _cms_cells(_word_hashes(words), d, w)
    return np.min(M[np.arange(d)[:, None], cols], axis=0)


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin–Lang–Liberty, simplified full-buffer
# compaction) — the MERGEABLE bounded-memory complement to the exact
# distributed quantiles in textstats.token_quantiles: per-partition
# sketches are O(k·log(N/k)) values regardless of N, so at 100 TB every
# partition ships a few-KB row table instead of participating in an
# exact two-phase rank exchange. Rank error is O(1/k) w.h.p.; the
# driver-visible gate (kll_value_quantiles) asserts ≤2 % rank error at
# k=200 against an exact streamed recount, so drift fails the hash
# compare.
# ---------------------------------------------------------------------------


class KLLSketch:
    """Level i holds items of weight 2^i. Level capacities shrink
    geometrically from the top (k · (2/3)^depth-from-top, floor 2);
    compaction sorts a full level and promotes every other element
    (seeded random offset — deterministic for a fixed partition
    layout). Exact while N ≤ k (no compaction has happened)."""

    def __init__(self, k: int = 200, seed: int = 0):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._rng = np.random.default_rng(seed)

    def _capacity(self, lvl: int) -> int:
        depth_from_top = len(self.levels) - 1 - lvl
        return max(2, int(self.k * (2.0 / 3.0) ** depth_from_top))

    def _compact_if_needed(self) -> None:
        while True:
            over = next((i for i, buf in enumerate(self.levels)
                         if len(buf) > self._capacity(i)), None)
            if over is None:
                return
            buf = np.sort(self.levels[over])
            off = int(self._rng.integers(0, 2))
            if len(buf) % 2:
                # hold one item back (an end, alternating by the seeded
                # coin) so m·w -> (m-1)/2·2w + 1·w: total weight is
                # preserved EXACTLY through every compaction, which the
                # grouped gate relies on (n_est == exact group count)
                keep, buf = (buf[:1], buf[1:]) if off else \
                    (buf[-1:], buf[:-1])
            else:
                keep = buf[:0]
            if over + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[over + 1] = np.concatenate(
                [self.levels[over + 1], buf[off::2]])
            self.levels[over] = keep

    def update_many(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, np.float64)
        # feed level 0 in capacity-sized slabs so buffers never balloon
        cap = max(self._capacity(0), 1)
        for i in range(0, len(vals), cap):
            self.levels[0] = np.concatenate(
                [self.levels[0], vals[i:i + cap]])
            self._compact_if_needed()

    def merge_rows(self, level: np.ndarray, value: np.ndarray) -> None:
        """Fold another sketch's (level, value) rows in — the standard
        KLL merge (levelwise concat, then compact)."""
        for lv in np.unique(level):
            lv = int(lv)
            while lv >= len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[lv] = np.concatenate(
                [self.levels[lv], value[level == lv]])
        self._compact_if_needed()

    def to_rows(self) -> tuple[np.ndarray, np.ndarray]:
        lv = np.concatenate([np.full(len(b), i, np.int32)
                             for i, b in enumerate(self.levels)]) \
            if any(len(b) for b in self.levels) else np.empty(0, np.int32)
        vals = np.concatenate(self.levels) if len(lv) else \
            np.empty(0, np.float64)
        return lv, vals

    def total(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        vals, ws = [], []
        for i, b in enumerate(self.levels):
            if len(b):
                vals.append(b)
                ws.append(np.full(len(b), 1 << i, np.int64))
        if not vals:
            # empty sketch: defined result instead of a concatenate
            # crash (review finding)
            return float("nan")
        v = np.concatenate(vals)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        target = q * cum[-1]
        return float(v[np.searchsorted(cum, target, side="left")
                       .clip(0, len(v) - 1)])


def kll_quantiles(ds, value_col: str, qs: list[float], k: int = 200):
    """Distributed KLL: every block builds a partial sketch (seeded
    from its content hash, so reruns are deterministic) and ships ONLY
    its (level, value) rows — O(k·log) per block; the driver folds the
    row tables with the standard merge and reads the quantiles off the
    merged sketch. (At cluster scale the fold tree-reduces like the
    sharded HLL; the per-block row table is the unit either way.)"""
    def part_sketch(t: pa.Table) -> pa.Table:
        import hashlib

        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        seed = int.from_bytes(hashlib.blake2b(
            v[:8].tobytes() + len(v).to_bytes(8, "little"),
            digest_size=4).digest(), "little")
        sk = KLLSketch(k, seed=seed)
        sk.update_many(v)
        lv, vals = sk.to_rows()
        return pa.table({"level": pa.array(lv, pa.int32()),
                         "value": pa.array(vals, pa.float64())})

    rows = ds.map_batches(part_sketch, batch_format="pyarrow").to_pandas()
    sk = KLLSketch(k, seed=1)
    sk.merge_rows(rows["level"].to_numpy(np.int32),
                  rows["value"].to_numpy(np.float64))
    return {q: sk.quantile(q) for q in qs}, sk.total()


def kll_group_quantiles(ds, group_col: str, value_col: str,
                        qs: list[float], k: int = 200,
                        n_parts: int = 16) -> pd.DataFrame:
    """Sketch-per-group quantiles — the mergeable-KLL shape applied per
    key: each block builds one KLL per group it sees and ships only
    (group, level, value) rows (O(k·log) per block-group cell), then ONE
    group-functional salted exchange merges each group's partials
    levelwise and reads the quantiles off the merged sketch where it
    lives. Nothing group-scaled touches the driver until the final
    n_groups × n_qs frame — the distributed analogue of DataSketches'
    per-dimension KLL rollup, and the scale path for "median doc length
    per language" when the group count is itself large.

    Returns (group, q, est, n_est) — n_est is the sketch's item count
    (exact: merge preserves total weight)."""

    def part_sketch(t: pa.Table) -> pa.Table:
        import hashlib

        groups = t[group_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        out_g, out_l, out_v = [], [], []
        for g in pd.unique(groups):
            v = vals[groups == g]
            seed = int.from_bytes(hashlib.blake2b(
                str(g).encode() + v[:8].tobytes()
                + len(v).to_bytes(8, "little"),
                digest_size=4).digest(), "little")
            sk = KLLSketch(k, seed=seed)
            sk.update_many(v)
            lv, vv = sk.to_rows()
            out_g.append(np.full(len(lv), g, dtype=object))
            out_l.append(lv)
            out_v.append(vv)
        return pa.table({
            # typed empty: bare pa.array([]) infers null and the block
            # schema then disagrees with non-empty blocks (review)
            group_col: (pa.array(np.concatenate(out_g)) if out_g
                        else pa.array([], type=t[group_col].type)),
            "level": pa.array(
                np.concatenate(out_l) if out_l else
                np.empty(0, np.int32), pa.int32()),
            "value": pa.array(
                np.concatenate(out_v) if out_v else
                np.empty(0, np.float64), pa.float64())})

    def group_key(t: pa.Table) -> np.ndarray:
        import hashlib
        groups = t[group_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(groups)
        hashed = np.asarray(
            [int.from_bytes(hashlib.blake2b(str(g).encode("utf-8"),
                                            digest_size=8).digest(),
                            "little") & 0x7FFFFFFF for g in uniq],
            dtype=np.int64)
        return hashed[codes]

    def merge_part(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for g, sub in df.groupby(group_col, sort=False):
            sk = KLLSketch(k, seed=1)
            sk.merge_rows(sub["level"].to_numpy(np.int32),
                          sub["value"].to_numpy(np.float64))
            n = sk.total()
            for q in qs:
                rows.append((g, float(q), sk.quantile(q), n))
        return pd.DataFrame(rows, columns=[group_col, "q", "est",
                                           "n_est"])

    out = salted_partition_apply(
        ds.map_batches(part_sketch, batch_format="pyarrow"),
        merge_part, group_key, n_parts=n_parts).to_pandas()
    return out.sort_values([group_col, "q"]).reset_index(drop=True)
