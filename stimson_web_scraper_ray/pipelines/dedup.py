"""Deduplication family over a documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

The reference only has exact-URL memo dedup (utils.py:134-181, D1/D2 in
SURVEY.md §2.7); the near-dup operators are the training-data-pipeline
additions mandated by the driver, built from the public algorithms
(Broder'97 minhash, Indyk-Motwani LSH banding, Charikar'02 simhash).

Scale shape: shingle/minhash/simhash are embarrassingly-parallel
``map_batches``; the only shuffles are ``groupby(hash)`` (exact) and
``groupby(band_id, band_hash)`` (LSH buckets). Candidate pairs are verified
with real Jaccard before linking; groups are resolved by min-doc-id label
propagation (bounded rounds), never a driver-side union-find over the full
corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstats import fnv1a_64

# --- exact ------------------------------------------------------------------


def add_md5(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col].to_pylist()
    h = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    return batch.append_column("text_md5", pa.array(h, pa.string()))


def exact_dedup_groups(ds, id_col: str = "doc_id", text_col: str = "text"):
    """hash-partition + per-group first: one row per distinct text with the
    keeper id and duplicate count (D1 exact fallback in SURVEY.md §2.7)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(lambda b: add_md5(b, text_col),
                            batch_format="pyarrow")
    return hashed.groupby("text_md5").aggregate(
        Min(id_col, alias_name="keep_doc_id"),
        Count(alias_name="n_dups"),
    )


# --- minhash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _hash_params(n_perm: int, seed: int = 1234):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    a |= np.uint64(1)   # odd ⇒ x → a·x+b is a bijection mod 2^64
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


_SHINGLE_C = np.uint64(0x100000001B3)  # FNV prime as rolling multiplier


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """k-word shingles → 64-bit hashes. Each word is FNV-hashed once and
    the k-window combined with a rolling polynomial in vectorized uint64
    (wraparound mixing) — ~5× less Python byte-looping than hashing each
    shingle string, with identical dedup semantics (the verify step uses
    true Jaccard on the same hash space)."""
    words = (text or "").lower().split()
    if len(words) < k:
        base = " ".join(words) if words else ""
        return np.array([fnv1a_64(base.encode())], dtype=np.uint64)
    wh = np.fromiter((fnv1a_64(w.encode()) for w in words),
                     dtype=np.uint64, count=len(words))
    n = len(words) - k + 1
    with np.errstate(over="ignore"):
        h = wh[0:n].copy()
        for j in range(1, k):
            h = h * _SHINGLE_C + wh[j:j + n]
        # fmix64 finalizer (MurmurHash3, public domain): the rolling
        # multiply only pushes entropy upward, and simhash's per-bit
        # majority vote needs every bit well-mixed
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


class MinHasher:
    """Stateful batch op (actor pool): permutation params built once."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 5, seed: int = 1234):
        self.n_perm = n_perm
        self.k = shingle_k
        self.a, self.b = _hash_params(n_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k).astype(np.uint64)
        if sh.size == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (a*x + b) mod p, min over shingles, vectorized (n_perm × n_shingles)
        x = sh.astype(object)  # avoid uint64 overflow via python ints
        vals = np.empty((self.n_perm,), dtype=np.uint64)
        sh64 = sh % _MERSENNE
        for i in range(self.n_perm):
            v = (int(self.a[i]) * sh64.astype(np.object_) + int(self.b[i])) % _MERSENNE
            vals[i] = np.uint64(min(v))
        return vals

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return batch.append_column(
            "minhash", pa.array([s.tolist() for s in sigs],
                                pa.list_(pa.uint64())))


class FastMinHasher(MinHasher):
    """float64-free vectorized variant: multiply in uint64 with wraparound
    (sufficient mixing for dedup; deterministic)."""

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        if sh.size == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = self.a[:, None] * sh[None, :] + self.b[:, None]
        return m.min(axis=1)


def lsh_band_rows(batch: pa.Table, n_bands: int = 16,
                  id_col: str = "doc_id") -> pa.Table:
    """signature → (band_id, band_hash, doc_id) rows, the LSH explode."""
    ids = batch[id_col].to_pylist()
    sigs = batch["minhash"].to_pylist()
    band_ids, band_hashes, doc_ids = [], [], []
    for did, sig in zip(ids, sigs):
        sig = np.asarray(sig, dtype=np.uint64)
        rows_per_band = len(sig) // n_bands
        for b in range(n_bands):
            chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
            band_ids.append(b)
            # int64 reinterpretation of the 64-bit hash: equality (the only
            # thing LSH needs) is bit-identical, and it survives the
            # pandas↔arrow round-trips of the groupby reduce, which choke
            # on uint64 values above 2^63
            band_hashes.append(
                int(np.uint64(fnv1a_64(chunk.tobytes())).astype(np.int64)))
            doc_ids.append(did)
    return pa.table({
        "band_id": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hashes, pa.int64()),
        "doc_id": pa.array(doc_ids, pa.int64()),
    })


def _bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """bucket → candidate pairs (a<b). Buckets are tiny by construction;
    cap quadratic blowup at 50 ids per bucket (log-worthy at scale)."""
    ids = sorted(group["doc_id"].tolist())[:50]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = set(shingle_hashes(text_a, k).tolist()), set(
        shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_dedup(ds, threshold: float = 0.7, n_perm: int = 64,
                      n_bands: int = 32, id_col: str = "doc_id"):
    """Full LSH pipeline → verified duplicate pairs (a, b, jaccard ≥
    threshold). Returns a Dataset of pairs sorted by (a, b)."""
    import ray
    import ray.data as rd

    sigs = ds.map_batches(FastMinHasher, batch_format="pyarrow",
                          concurrency=(1, 12),
                          fn_constructor_kwargs={"n_perm": n_perm})
    bands = sigs.map_batches(
        lambda b: lsh_band_rows(b, n_bands=n_bands, id_col=id_col),
        batch_format="pyarrow")
    # Bucket pairing on the driver: the band table is a PLANNING table
    # (n_docs × n_bands rows of three ints — no text), and almost every
    # (band_id, band_hash) bucket is a singleton; Ray's
    # groupby().map_groups pays per-group Python dispatch on all of them
    # (~10s on 160k buckets here, vs ~0.2s in one vectorized pandas pass).
    # At a corpus where the band table outgrows the driver, this step is
    # the distributed groupby(band_id, band_hash) shuffle + count>1
    # filter — same algebra, wider exchange.
    bands_df = bands.to_pandas()
    sizes = bands_df.groupby(["band_id", "band_hash"], sort=False)[
        "doc_id"].transform("size")
    dup_rows = bands_df[sizes > 1]
    if dup_rows.empty:
        return rd.from_pandas(pd.DataFrame({"a": [], "b": [], "jaccard": []}))
    pairs_df = dup_rows.groupby(["band_id", "band_hash"], sort=False) \
        .apply(_bucket_pairs, include_groups=False).reset_index(drop=True)
    if pairs_df.empty:
        return rd.from_pandas(pd.DataFrame({"a": [], "b": [], "jaccard": []}))
    pairs_df = pairs_df.drop_duplicates(["a", "b"])

    # verify with true Jaccard: broadcast the candidate texts (small side —
    # candidates only), join inside map_batches
    cand_ids = sorted(set(pairs_df["a"]) | set(pairs_df["b"]))
    texts = ds.map_batches(
        lambda b: b.select([id_col, "text"]).filter(
            pa.compute.is_in(b[id_col], value_set=pa.array(cand_ids))),
        batch_format="pyarrow").to_pandas()
    text_map_ref = ray.put(dict(zip(texts[id_col], texts["text"])))

    pairs_ds = rd.from_pandas(pairs_df.sort_values(["a", "b"]).reset_index(drop=True))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        tm = ray.get(text_map_ref)
        jac = [round(jaccard(tm.get(a, ""), tm.get(b, "")), 4)
               for a, b in zip(batch["a"], batch["b"])]
        batch = batch.assign(jaccard=jac)
        return batch[batch["jaccard"] >= threshold]

    return pairs_ds.map_batches(verify, batch_format="pandas")


def resolve_duplicate_groups(pairs_df: pd.DataFrame,
                             max_rounds: int = 10) -> pd.DataFrame:
    """Duplicate pairs (a, b) → cluster labels via min-label propagation:
    each id's label is the minimum id reachable through pairs. Returns
    (doc_id, keep_doc_id); rows with keep_doc_id == doc_id are keepers.

    Implemented as bounded rounds of grouped min-joins — the same algebra
    runs as `groupby(label).aggregate(Min)` over edge tables at cluster
    scale (ray_guide: 'iterate a few rounds of min-label propagation');
    pandas here because verified pair sets are small relative to the
    corpus. Converges in O(log(diameter)) rounds."""
    if pairs_df.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "keep_doc_id": pd.Series(dtype="int64")})
    a = pairs_df["a"].to_numpy(dtype=np.int64)
    b = pairs_df["b"].to_numpy(dtype=np.int64)
    ids = np.unique(np.concatenate([a, b]))
    idx = {int(v): i for i, v in enumerate(ids)}
    ea = np.fromiter((idx[int(x)] for x in a), dtype=np.int64, count=len(a))
    eb = np.fromiter((idx[int(x)] for x in b), dtype=np.int64, count=len(b))
    label = np.arange(len(ids), dtype=np.int64)
    for _ in range(max_rounds):
        lo = np.minimum(label[ea], label[eb])
        new_label = label.copy()
        np.minimum.at(new_label, ea, lo)
        np.minimum.at(new_label, eb, lo)
        new_label = np.minimum(new_label, new_label[new_label])  # pointer jump
        if (new_label == label).all():
            break
        label = new_label
    return pd.DataFrame({"doc_id": ids,
                         "keep_doc_id": ids[label]}) \
        .sort_values("doc_id").reset_index(drop=True)


# --- simhash ----------------------------------------------------------------


def simhash64(text: str) -> int:
    """Charikar simhash over word features (64-bit)."""
    v = np.zeros(64, dtype=np.int64)
    for w in (text or "").lower().split():
        h = fnv1a_64(w.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        v += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hs = np.fromiter((simhash64(t) for t in batch[text_col].to_pylist()),
                     dtype=np.uint64, count=batch.num_rows)
    return batch.append_column("simhash", pa.array(hs, pa.uint64()))


def simhash_near_dup_pairs(ds, max_hamming: int = 3, id_col: str = "doc_id"):
    """Near-dup pairs by simhash hamming distance, bucketed by 16-bit
    chunks (a pair within distance d≤3 shares at least one of 4 chunks —
    pigeonhole), so the shuffle key is (chunk_idx, chunk_value)."""
    import pandas as pd

    hashed = ds.map_batches(add_simhash, batch_format="pyarrow")

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        hs = batch["simhash"].to_numpy(zero_copy_only=False)
        cidx, cval, dids, full = [], [], [], []
        for did, h in zip(ids, hs):
            for c in range(4):
                cidx.append(c)
                cval.append(int((int(h) >> (16 * c)) & 0xFFFF))
                dids.append(did)
                full.append(int(h))
        return pa.table({"chunk_idx": pa.array(cidx, pa.int32()),
                         "chunk_val": pa.array(cval, pa.int32()),
                         "doc_id": pa.array(dids, pa.int64()),
                         "simhash": pa.array(full, pa.uint64())})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group[["doc_id", "simhash"]].drop_duplicates("doc_id") \
            .sort_values("doc_id").values[:50]
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                ham = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if ham <= max_hamming:
                    a.append(int(rows[i][0]))
                    b.append(int(rows[j][0]))
                    d.append(ham)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    # Driver-side bucket pairing on the planning table (chunk rows are 4
    # ints per doc, no text); mostly-singleton buckets make Ray
    # map_groups pay per-group dispatch for nothing — same reasoning and
    # scale path as minhash_lsh_dedup above.
    import ray.data as rd

    chunks_df = hashed.map_batches(chunk_rows,
                                   batch_format="pyarrow").to_pandas()
    sizes = chunks_df.groupby(["chunk_idx", "chunk_val"], sort=False)[
        "doc_id"].transform("size")
    dup_rows = chunks_df[sizes > 1]
    if dup_rows.empty:
        return rd.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "hamming": pd.Series(dtype="int64")}))
    pairs_df = dup_rows.groupby(["chunk_idx", "chunk_val"], sort=False) \
        .apply(bucket_pairs, include_groups=False).reset_index(drop=True)
    return rd.from_pandas(pairs_df)


# --- n-gram jaccard (direct, for small candidate sets) ----------------------


def ngram_jaccard_matrix(ds, id_col: str = "doc_id", k: int = 3,
                         threshold: float = 0.5):
    """All-pairs n-gram Jaccard via LSH-free banding on rarest shingle —
    here implemented as: shingle rows → groupby(shingle) → pairs → verify.
    Intended for filtered candidate subsets, not the full corpus."""
    import pandas as pd

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids, sh_out, id_out = batch[id_col].to_pylist(), [], []
        for did, t in zip(ids, batch["text"].to_pylist()):
            for s in set(shingle_hashes(t, k).tolist()):
                sh_out.append(s)
                id_out.append(did)
        return pa.table({"shingle": pa.array(sh_out, pa.uint64()),
                         "doc_id": pa.array(id_out, pa.int64())})

    pairs = ds.map_batches(shingle_rows, batch_format="pyarrow") \
        .groupby("shingle").map_groups(_bucket_pairs, batch_format="pandas")
    pairs_df = pairs.to_pandas()
    if pairs_df.empty:
        return pairs_df
    counts = pairs_df.groupby(["a", "b"]).size().rename("common").reset_index()
    return counts


# --- embedding cosine near-dup ----------------------------------------------


def embedding_neardup_pairs(ds, threshold: float = 0.95,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            n_tables: int = 4, n_planes: int = 4):
    """Near-dup by embedding cosine ≥ threshold: multi-table random-
    hyperplane LSH (n_tables independent tables of n_planes sign bits —
    recall at cos 0.95 ≈ 1-(1-0.9^4)^4 ≈ 0.99) → per-bucket exact cosine →
    dedup pairs. Shuffle key is (table, bucket); each vector emits
    n_tables rows."""
    import pandas as pd

    def assign_buckets(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_pylist()
        dim = vecs.shape[1] if vecs.ndim == 2 else 0
        planes = np.random.default_rng(99).normal(
            size=(n_tables, dim, n_planes))
        t_out, b_out, id_out, v_out = [], [], [], []
        for t in range(n_tables):
            signs = (vecs @ planes[t]) > 0
            buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
            t_out.extend([t] * len(ids))
            b_out.extend(buckets.astype(np.int64).tolist())
            id_out.extend(ids)
            v_out.extend(vecs.tolist())
        return pa.table({
            "table_id": pa.array(t_out, pa.int32()),
            "bucket": pa.array(b_out, pa.int64()),
            id_col: pa.array(id_out, pa.int64()),
            vec_col: pa.array(v_out, pa.list_(pa.float64())),
        })

    def bucket_cosine_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(id_col).sort_values(id_col).head(500)
        ids = g[id_col].to_numpy()
        vecs = np.array(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1
        cos = (vecs / norms) @ (vecs / norms).T
        a, b, c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if cos[i, j] >= threshold:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    c.append(round(float(cos[i, j]), 4))
        return pd.DataFrame({"a": a, "b": b, "cosine": c})

    pairs = ds.map_batches(assign_buckets, batch_format="pyarrow") \
        .groupby(["table_id", "bucket"]).map_groups(bucket_cosine_pairs,
                                                    batch_format="pandas")
    df = pairs.to_pandas()
    if df.empty:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}))
    import ray.data as rd

    return rd.from_pandas(df.drop_duplicates(["a", "b"])
                          .sort_values(["a", "b"]).reset_index(drop=True))


# --- n-gram Jaccard (exact, inverted-index form) ----------------------------

_WORD_SPLIT = None  # compiled lazily per worker


def _word_ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct word n-grams of lower(text) split on [^a-z0-9_]+ — the
    tokenization is shared verbatim with the DuckDB oracle in
    __ray_entry__.oracle_sql()['ngram_jaccard_pairs']."""
    global _WORD_SPLIT
    if _WORD_SPLIT is None:
        import re

        _WORD_SPLIT = re.compile(r"[^a-z0-9_]+")
    ws = [w for w in _WORD_SPLIT.split((text or "").lower()) if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def ngram_jaccard_pairs(ds, n: int = 3, threshold: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text"):
    """Exact n-gram Jaccard near-dup pairs via a distributed inverted
    index: doc → distinct n-grams → (gram_hash, doc) rows →
    ``groupby(gram_hash)`` (the one wide shuffle) → per-bucket pairs →
    ``groupby(a, b)`` intersection counts → Jaccard against broadcast
    set sizes. Gram strings never shuffle — only 64-bit FNV hashes
    (collision odds ~G²/2⁶⁴, immaterial against the oracle corpus)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    def gram_rows(batch: pa.Table) -> pa.Table:
        gh, dids = [], []
        for did, text in zip(batch[id_col].to_pylist(),
                             batch[text_col].to_pylist()):
            for g in _word_ngrams(text, n):
                gh.append(fnv1a_64(g.encode("utf-8")))
                dids.append(did)
        return pa.table({"gram": pa.array(gh, pa.uint64()),
                         "doc_id": pa.array(dids, pa.int64())})

    def sizes(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ns = [len(_word_ngrams(t, n)) for t in batch[text_col].to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_grams": pa.array(ns, pa.int64())})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(group["doc_id"].tolist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pd.DataFrame({"a": pd.Series(a, dtype="int64"),
                             "b": pd.Series(b, dtype="int64")})

    size_df = ds.map_batches(sizes, batch_format="pyarrow").to_pandas()
    nmap = dict(zip(size_df["doc_id"], size_df["n_grams"]))
    nref = ray.put(nmap)  # broadcast small side — no shuffle join

    inter = ds.map_batches(gram_rows, batch_format="pyarrow") \
        .groupby("gram").map_groups(bucket_pairs, batch_format="pandas") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="i"))

    def jaccard_filter(batch: pd.DataFrame) -> pd.DataFrame:
        nm = ray.get(nref)
        na = batch["a"].map(nm)
        nb = batch["b"].map(nm)
        jac = batch["i"] / (na + nb - batch["i"])
        batch = batch.assign(jaccard=jac.round(4))
        return batch[batch["jaccard"] >= threshold][["a", "b", "jaccard"]]

    df = inter.map_batches(jaccard_filter, batch_format="pandas").to_pandas()
    if df.empty:
        return rd.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))
    return rd.from_pandas(df.sort_values(["a", "b"]).reset_index(drop=True))
