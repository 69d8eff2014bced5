"""Dedup / similarity / textstats / multimodal pipeline correctness
(planted-duplicate recall, exact-vs-brute-force parity)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from stimson_web_scraper_ray.pipelines import dedup, similarity, textstats
from stimson_web_scraper_ray.pipelines.multimodal import (
    decode_pipeline,
    synth_media_table,
)


@pytest.fixture(scope="module")
def docs_with_dups(ray_session):
    base = [
        "the quick brown fox jumps over the lazy dog and then runs far away into the deep green forest tonight",
        "a completely different document about data processing engines and the way they shuffle blocks around clusters",
        "yet another text talking about machine learning models and the training data pipelines that feed them daily",
        "crawling the web politely requires a frontier a seen set and per host budgets that keep servers happy",
    ]
    texts, ids = [], []
    for i, b in enumerate(base):
        texts.append(b)
        ids.append(i * 10)
        # near-dup: one word changed
        texts.append(b.replace("the", "a", 1))
        ids.append(i * 10 + 1)
        # exact dup
        texts.append(b)
        ids.append(i * 10 + 2)
    # unrelated fillers
    rng = np.random.default_rng(3)
    vocab = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    for j in range(20):
        texts.append(" ".join(rng.choice(vocab, size=30)))
        ids.append(1000 + j)
    return rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))


def test_exact_dedup(docs_with_dups):
    df = dedup.exact_dedup_groups(docs_with_dups).to_pandas()
    dup_groups = df[df["n_dups"] >= 2]
    assert len(dup_groups) == 4          # each base text appears 2×
    assert set(dup_groups["keep_doc_id"]) == {0, 10, 20, 30}


def test_minhash_lsh_finds_planted_neardups(docs_with_dups):
    pairs = dedup.minhash_lsh_dedup(docs_with_dups, threshold=0.4).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    for base in (0, 10, 20, 30):
        assert (base, base + 2) in got          # exact dup pair
        assert (base, base + 1) in got          # one-word-changed near-dup
    # verified jaccard values are real jaccard
    for _, row in pairs.iterrows():
        assert 0.4 <= row["jaccard"] <= 1.0


def test_simhash_finds_planted_neardups(docs_with_dups):
    pairs = dedup.simhash_near_dup_pairs(docs_with_dups, max_hamming=4) \
        .to_pandas().drop_duplicates(["a", "b"])
    got = set(map(tuple, pairs[["a", "b"]].values))
    for base in (0, 10, 20, 30):
        assert (base, base + 2) in got
    hams = pairs.set_index(["a", "b"])["hamming"]
    assert hams.loc[(0, 2)] == 0                 # identical text → distance 0


def test_embedding_neardup_planted(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(100, 16))
    # plant: 100+i is a tiny perturbation of i for i in 0..4
    ids = list(range(100))
    all_vecs = list(vecs)
    for i in range(5):
        ids.append(100 + i)
        all_vecs.append(vecs[i] + rng.normal(scale=0.01, size=16))
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [v.tolist() for v in all_vecs]}))
    pairs = dedup.embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values))
    found = sum((i, 100 + i) in got for i in range(5))
    assert found >= 4                            # multi-table LSH recall
    for _, row in pairs.iterrows():
        assert row["cosine"] >= 0.98


def test_embedding_neardup_stream_path_matches_broadcast(ray_session,
                                                         sf_dir):
    """broadcast_limit_bytes=0 forces the 100-TB stream path (ids-only
    bucket exchange, candidate-pair dedup, per-pair vector joins); it
    must emit exactly the broadcast path's (a, b, cosine) rows."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    bcast = dedup.embedding_neardup_pairs(ds, threshold=0.4).to_pandas()
    stream = dedup.embedding_neardup_pairs(
        ds, threshold=0.4, broadcast_limit_bytes=0).to_pandas()
    pd.testing.assert_frame_equal(bcast, stream)
    assert len(bcast) > 0


def test_minhash_verify_join_path_matches_broadcast(ray_session, sf_dir):
    """broadcast_limit=0 forces the minhash verify's per-part text-join
    path; pairs and jaccard values must match the broadcast verify."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    a = dedup.minhash_lsh_dedup(ds, threshold=0.5).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    b = dedup.minhash_lsh_dedup(ds, threshold=0.5, broadcast_limit=0) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_embedding_neardup_recall_vs_exact(ray_session, sf_dir):
    # auto-tuned table count must hold the theory-derived recall target
    # against the EXACT blocked all-pairs truth at a loose threshold
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    truth = dedup.exact_cosine_pairs(ds, threshold=0.4)
    pred = dedup.embedding_neardup_pairs(ds, threshold=0.4).to_pandas()
    t = set(map(tuple, truth[["a", "b"]].values))
    p = set(map(tuple, pred[["a", "b"]].values))
    assert len(p - t) == 0                       # exact verify: no false pos
    assert len(t & p) / max(1, len(t)) >= 0.85   # ~0.9 target minus noise


def test_brute_force_topk_matches_numpy(ray_session, sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist())
    q = vecs[:2]
    # exact numpy answer
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    nq = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = nv @ nq.T
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    df = similarity.brute_force_topk(ds, q, k=5)
    for qi in range(2):
        expected = ids[np.lexsort((ids, -sims[:, qi]))[:5]].tolist()
        got = df[df["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == expected


def test_ivf_topk_recall(ray_session, sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.array(t.slice(0, 1)["embedding"].to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = similarity.brute_force_topk(ds, q, k=10)["vec_id"].tolist()
    approx = similarity.ivf_topk(ds, q, k=10, n_clusters=8, n_probe=4)[
        "vec_id"].tolist()
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.6, recall
    assert approx[0] == exact[0] == 0            # self-match first


def test_lsh_topk_recall_and_prune(ray_session, sf_dir):
    """LSH-bucketed ANN: self-match first, recall@10 ≥ 0.7 vs brute
    force, and the bucket filter actually prunes (survivor count is a
    strict subset of the corpus at the tuned defaults)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    q = np.array(t.slice(0, 1)["embedding"].to_pylist(), dtype=np.float64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = similarity.brute_force_topk(ds, q, k=10)["vec_id"].tolist()
    approx = similarity.lsh_topk(ds, q, k=10)
    got = approx["vec_id"].tolist()
    assert len(set(exact) & set(got)) / 10 >= 0.7
    assert got[0] == exact[0] == 0               # self-match survives LSH
    # prune evidence: single-query survivors < 85% of the corpus even
    # on this near-uniform worst-case data
    import stimson_web_scraper_ray.pipelines.similarity as sim
    orig = sim.brute_force_topk
    seen = {}
    try:
        def spy(inner_ds, *a, **k):
            seen["n"] = inner_ds.count()
            return orig(inner_ds, *a, **k)
        sim.brute_force_topk = spy
        similarity.lsh_topk(ds, q, k=10)
    finally:
        sim.brute_force_topk = orig
    assert seen["n"] < 0.85 * t.num_rows, seen


def test_corpus_keywords_match_pandas(docs_with_dups):
    got = textstats.corpus_top_keywords(docs_with_dups, k=5,
                                        stop_lang=None).to_pandas()
    texts = docs_with_dups.to_pandas()["text"]
    counts = {}
    for t in texts:
        for w in textstats.split_words(t):
            if w and not w.isnumeric():
                counts[w] = counts.get(w, 0) + 1
    expected = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]),
                      reverse=True)[:5]
    assert list(map(tuple, got[["word", "freq"]].values)) == expected


def test_textstats_columns(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = ds.map_batches(textstats.add_token_counts, batch_format="pyarrow") \
        .map_batches(textstats.add_quality_scores, batch_format="pyarrow") \
        .map_batches(textstats.add_langid, batch_format="pyarrow") \
        .map_batches(textstats.add_fingerprints, batch_format="pyarrow")
    df = out.to_pandas()
    assert (df["n_tokens"] > 0).all()
    assert df["punct_ratio"].between(0, 1).all()
    assert (df["fingerprint"].str.len() == 32).all()  # md5 hex
    # determinism (block order may vary between runs — compare by doc_id)
    df2 = out.to_pandas()
    a = df.sort_values("doc_id")["fingerprint"].values
    b = df2.sort_values("doc_id")["fingerprint"].values
    assert (a == b).all()


def test_multimodal_decode_plumbing(ray_session):
    ds = rd.from_arrow(synth_media_table(n=40))
    df = decode_pipeline(ds, fake=True).to_pandas()
    assert len(df) == 40
    assert (df["width"] >= 8).all() and (df["height"] >= 8).all()
    # deterministic fake codec
    df2 = decode_pipeline(rd.from_arrow(synth_media_table(n=40)),
                          fake=True).to_pandas()
    assert df.sort_values("media_id")["width"].tolist() == \
        df2.sort_values("media_id")["width"].tolist()


def test_multimodal_resize_and_audio(ray_session):
    from stimson_web_scraper_ray.pipelines.multimodal import (
        AudioFeatures,
        ImageResize,
    )

    ds = rd.from_arrow(synth_media_table(n=24))
    r = ds.map_batches(ImageResize, batch_format="pyarrow", batch_size=8,
                       concurrency=(1, 2),
                       fn_constructor_kwargs={"fake": True}).to_pandas()
    assert len(r) == 24
    assert (r["width"] == 8).all() and (r["height"] == 8).all()
    # PPM rows (even ids) re-encode with a header; fake rows are raw RGB
    from stimson_web_scraper_ray.pipelines.multimodal import (
        PPM_MIME,
        decode_ppm,
    )

    for _, row in r.iterrows():
        if row["mime"] == PPM_MIME:
            assert decode_ppm(row["payload"]).shape == (8, 8, 3)
        else:
            assert len(row["payload"]) == 8 * 8 * 3

    a = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                       concurrency=(1, 2),
                       fn_constructor_kwargs={"fake": True}).to_pandas()
    assert len(a) == 24
    assert (a["duration_s"] > 0).all() and (a["rms"] > 0).all()
    a2 = ds.map_batches(AudioFeatures, batch_format="pyarrow", batch_size=8,
                        concurrency=(1, 2),
                        fn_constructor_kwargs={"fake": True}).to_pandas()
    assert a.sort_values("media_id")["rms"].tolist() == \
        a2.sort_values("media_id")["rms"].tolist()      # deterministic


def test_media_similarity_self_match(ray_session):
    from stimson_web_scraper_ray.pipelines.multimodal import media_similarity

    ds = rd.from_arrow(synth_media_table(n=32))
    df = media_similarity(ds, query_media_id=0, k=5)
    assert df.iloc[0]["media_id"] == 0                  # self-match first
    assert abs(df.iloc[0]["cos_sim"] - 1.0) < 1e-9


def test_write_partitioned_parquet_resume(ray_session, sf_dir, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.sources.sinks import (
        write_partitioned_parquet,
    )

    out = str(tmp_path / "parts")

    def src():
        return rd.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "lang"])

    skipped, written = write_partitioned_parquet(src(), out, "lang")
    assert skipped == 0 and written >= 2

    # simulate a crash: one partition loses its marker → must be
    # rewritten; all marked partitions must be pruned from the stream
    victim = sorted(glob.glob(out + "/lang=*"))[0]
    os.remove(os.path.join(victim, "_SUCCESS"))
    skipped2, written2 = write_partitioned_parquet(src(), out, "lang")
    assert written2 == 1 and skipped2 == written - 1

    # the final layout round-trips the full table exactly once
    got = pq.read_table(out).to_pandas()
    orig = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"]).to_pandas()
    assert sorted(got["doc_id"].tolist()) == sorted(orig["doc_id"].tolist())


def test_multimodal_real_codec_dispatch():
    """fake=False WORKS for PPM rows (real codec) and raises only when a
    non-PPM mime actually arrives — the honest capability boundary."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.multimodal import (
        PPM_MIME,
        ImageDecodeFeatures,
        encode_ppm,
    )

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    stage = ImageDecodeFeatures(fake=False)
    ok = stage(pa.table({
        "media_id": pa.array([0], pa.int64()),
        "mime": pa.array([PPM_MIME], pa.string()),
        "payload": pa.array([encode_ppm(img)], pa.binary())}))
    assert ok["height"][0].as_py() == 4 and ok["width"][0].as_py() == 3
    with pytest.raises(NotImplementedError):
        stage(pa.table({
            "media_id": pa.array([1], pa.int64()),
            "mime": pa.array(["image/jpeg"], pa.string()),
            "payload": pa.array([b"\xff\xd8junk"], pa.binary())}))


def test_resolve_duplicate_groups_chain_and_clusters():
    import pandas as pd

    # chain 1-2-3-4 and separate pair (10,11); singleton 99 not in pairs
    pairs = pd.DataFrame({"a": [1, 2, 3, 10], "b": [2, 3, 4, 11]})
    out = dedup.resolve_duplicate_groups(pairs)
    labels = dict(zip(out["doc_id"], out["keep_doc_id"]))
    assert labels[1] == labels[2] == labels[3] == labels[4] == 1
    assert labels[10] == labels[11] == 10
    assert 99 not in labels


def test_resolve_duplicate_groups_from_lsh(docs_with_dups):
    pairs = dedup.minhash_lsh_dedup(docs_with_dups, threshold=0.4).to_pandas()
    groups = dedup.resolve_duplicate_groups(pairs)
    labels = dict(zip(groups["doc_id"], groups["keep_doc_id"]))
    for base in (0, 10, 20, 30):
        # near-dup + exact-dup collapse to one keeper: the min doc_id
        assert labels[base + 1] == base and labels[base + 2] == base


def test_minhash_distributed_pairing_matches_pandas_oracle(docs_with_dups):
    """The distributed bucket-pairing path (groupby Count → isin semi-join
    → per-bucket pairs) must produce exactly the pairs an independent
    single-process pandas banding of the same signatures produces."""
    pairs = dedup.minhash_lsh_dedup(docs_with_dups, threshold=0.4) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    # in-test oracle: same signatures, banding + pairing in plain pandas
    hasher = dedup.FastMinHasher(n_perm=64)
    docs = docs_with_dups.to_pandas()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        sig = hasher.signature(text)
        rpb = len(sig) // 32
        for b in range(32):
            chunk = sig[b * rpb:(b + 1) * rpb]
            rows.append((b, dedup.fnv1a_64(chunk.tobytes()), did))
    bands = pd.DataFrame(rows, columns=["band_id", "band_hash", "doc_id"])
    cand = set()
    for _, grp in bands.groupby(["band_id", "band_hash"]):
        ids = sorted(grp["doc_id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    expected = sorted((a, b) for a, b in cand
                      if dedup.jaccard(
                          docs.set_index("doc_id")["text"][a],
                          docs.set_index("doc_id")["text"][b]) >= 0.4)
    assert list(zip(pairs["a"], pairs["b"])) == expected


def test_hamming_hot_bucket_salting_exact(ray_session):
    """Lossless hot-bucket salting (the dup-heavy-corpus shape): 12k
    docs share ONE 8-bit chunk value, so the unsalted core would
    self-merge 12k² ≈ 144M rows inside a single part — the quadratic
    blowup the verdict flagged. With hot_bucket_rows forcing the
    salted path (recursive pigeonhole over the remaining 56 bits),
    the test both COMPLETES (no single-part quadratic merge fits that
    budget) and matches a blocked brute-force popcount truth exactly:
    recall = precision = 1.0 on 25 planted ≤3-bit-flip partners plus
    any incidental pairs. A smaller planted set also pins salted ==
    unsalted output (losslessness), including a top-chunk hot bucket
    (the undefined->>64 edge)."""
    import numpy as np
    import pandas as pd

    from stimson_web_scraper_ray.pipelines.dedup import (
        _popcount64, hamming_near_dup_pairs)

    rng = np.random.default_rng(42)
    n = 12_000
    hashes = ((rng.integers(0, 1 << 56, n, dtype=np.uint64)
               << np.uint64(8)) | np.uint64(0xAB))
    for k in range(25):
        v = hashes[k]
        for f in rng.choice(np.arange(8, 64),
                            size=rng.integers(1, 4), replace=False):
            v ^= np.uint64(1) << np.uint64(f)
        hashes[n - 25 + k] = v
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "h": hashes})
    got = hamming_near_dup_pairs(
        rd.from_pandas(df), "h", n_chunks=8, max_hamming=3,
        hot_bucket_rows=256).to_pandas()
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    truth = set()
    for s in range(0, n, 1000):
        ham = _popcount64(hashes[s:s + 1000, None] ^ hashes[None, :])
        ii, jj = np.nonzero(ham <= 3)
        # i is already the GLOBAL row (ii + s) — the earlier `i + s < j`
        # double-added the offset and silently dropped every true pair
        # with id distance <= block size (review finding)
        truth |= {(int(i), int(j)) for i, j in zip(ii + s, jj) if i < j}
    assert len(truth) >= 25
    assert got_pairs == truth

    # losslessness: salted == unsalted on a small set hot in the TOP
    # chunk (bits 56-63 identical)
    m = 800
    h2 = (rng.integers(0, 1 << 56, m, dtype=np.uint64)
          | (np.uint64(0xCD) << np.uint64(56)))
    for k in range(10):
        v = h2[k]
        for f in rng.choice(np.arange(0, 56),
                            size=rng.integers(1, 4), replace=False):
            v ^= np.uint64(1) << np.uint64(f)
        h2[m - 10 + k] = v
    d2 = pd.DataFrame({"doc_id": np.arange(m, dtype=np.int64),
                       "h": h2})
    salted = hamming_near_dup_pairs(
        rd.from_pandas(d2), "h", n_chunks=8, max_hamming=3,
        hot_bucket_rows=64).to_pandas()
    plain = hamming_near_dup_pairs(
        rd.from_pandas(d2), "h", n_chunks=8, max_hamming=3,
        hot_bucket_rows=10 ** 9).to_pandas()
    assert salted.equals(plain)
    assert len(salted) >= 10


def test_simhash_distributed_pairing_matches_pandas_oracle(docs_with_dups):
    """Distributed simhash chunk-bucket pairing == plain pandas pairing."""
    pairs = dedup.simhash_near_dup_pairs(docs_with_dups, max_hamming=4) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    docs = docs_with_dups.to_pandas()
    sim = {did: dedup.simhash64(t)
           for did, t in zip(docs["doc_id"], docs["text"])}
    cand = set()
    rows = [(c, (h >> (16 * c)) & 0xFFFF, did)
            for did, h in sim.items() for c in range(4)]
    cdf = pd.DataFrame(rows, columns=["ci", "cv", "doc_id"])
    for _, grp in cdf.groupby(["ci", "cv"]):
        ids = sorted(grp["doc_id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(sim[ids[i]] ^ sim[ids[j]]).count("1")
                if ham <= 4:
                    cand.add((ids[i], ids[j], ham))
    expected = sorted(cand)
    got = sorted(zip(pairs["a"], pairs["b"], pairs["hamming"]))
    assert got == expected


def test_gopher_filters_semantics():
    """Gopher rules on hand-built docs: a clean doc keeps, a repeated-line
    doc and a bullet-list doc are dropped; ratios match hand math."""
    import pyarrow as pa

    good = " ".join(f"word{i % 97} token" for i in range(40))  # 80 words
    dupl = "\n".join(["the same line again"] * 10 + ["unique one"]) + \
        " " + " ".join(["pad"] * 60)
    bullets = "\n".join(f"- item {i} listed here" for i in range(20))
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([good, dupl, bullets], pa.string())})
    out = textstats.add_gopher_filters(t).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "gopher_keep"])
    # 11 non-empty lines, 2 distinct -> dup frac 1 - 2/11 > 0.3
    assert out.loc[2, "dup_line_frac"] > 0.3 and not bool(
        out.loc[2, "gopher_keep"])
    assert out.loc[3, "bullet_line_frac"] == 1.0 and not bool(
        out.loc[3, "gopher_keep"])
    # empty text row survives with zeros
    z = textstats.add_gopher_filters(
        pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array([""], pa.string())})).to_pandas()
    assert int(z["n_words_g"][0]) == 0 and not bool(z["gopher_keep"][0])


def test_redact_pii_kernels():
    import pyarrow as pa

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([
                      "mail bob.smith@example.org or +1 (212) 555-0187 now",
                      "no pii here at all",
                      "two: a@b.co then c@d.io end",
                  ], pa.string())})
    out = textstats.redact_pii(t).to_pandas()["clean_text"].tolist()
    assert "<EMAIL>" in out[0] and "<PHONE>" in out[0]
    assert "bob.smith" not in out[0] and "555" not in out[0]
    assert out[1] == "no pii here at all"
    assert out[2].count("<EMAIL>") == 2


def test_top_image_selection_over_synth_dims():
    """Every doc gets 5 deterministic candidates; the winner always beats
    the sprite/logo candidates unless they alone pass the gates."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.multimodal import (
        _synth_dims,
        top_image_batch,
    )
    from stimson_web_scraper_ray.functions.images import calculate_area

    t = pa.table({"doc_id": pa.array(list(range(50)), pa.int64())})
    out = top_image_batch(t).to_pandas()
    assert len(out) == 50
    for _, row in out.iterrows():
        if not row["top_image"]:
            continue
        url = row["top_image"]
        w, h = _synth_dims(url)
        assert abs(calculate_area(url, (w, h)) - row["best_area"]) < 0.01
    # dims are pure functions of the url
    assert _synth_dims("http://x/y.jpg") == _synth_dims("http://x/y.jpg")


def test_contamination_flags_planted(ray_session):
    """A corpus doc that copies a benchmark doc's text is flagged; an
    unrelated doc is not; benchmark rows don't appear in the output."""
    import pyarrow as pa

    bench_text = " ".join(f"tok{i}" for i in range(30))     # doc_id 0 (0%37)
    copycat = "intro words here " + bench_text              # shares 8-grams
    clean = " ".join(f"other{i}" for i in range(30))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([bench_text, copycat, clean], pa.string()),
    }))
    df = dedup.contamination_flags(ds, n=8, bench_mod=37).to_pandas() \
        .set_index("doc_id")
    assert list(df.index) == [1, 2]
    assert bool(df.loc[1, "contaminated"])
    assert df.loc[1, "n_contaminated_grams"] == 23   # 30-8+1 shared grams
    assert not bool(df.loc[2, "contaminated"])


def test_train_set_composite(ray_session, sf_dir):
    """train_set = decontaminate ∘ gopher ∘ exact-dedup ∘ token-count.
    Survivors must be: non-benchmark, gopher-keep, uncontaminated, and
    the min doc_id of their md5 group — cross-checked per property."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.compose import train_set
    from stimson_web_scraper_ray.pipelines.textstats import add_gopher_filters

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = train_set(ds).to_pandas()
    assert len(out) > 0
    assert (out["doc_id"] % 37 != 0).all()          # no benchmark docs
    assert out["doc_id"].is_unique
    # every survivor passes gopher on its own text
    full = ds.to_pandas().set_index("doc_id")
    surv_texts = full.loc[out["doc_id"], "text"]
    g = add_gopher_filters(pa.table({
        "doc_id": pa.array(out["doc_id"], pa.int64()),
        "text": pa.array(surv_texts.tolist(), pa.string()),
    })).to_pandas()
    assert g["gopher_keep"].all()
    # n_tokens matches whitespace split of the kept text
    assert (out.sort_values("doc_id")["n_tokens"].values ==
            [len(t.split()) for t in surv_texts.loc[
                out.sort_values("doc_id")["doc_id"]]]).all()


def test_weighted_sample_deterministic_and_rated(ray_session):
    """Hash sampling: same input -> same rows; per-stratum keep rates
    near their targets; rate 0 and 1 exact."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.sampling import weighted_sample

    n = 4000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(n)],
                         pa.string()),
    })
    ds = rd.from_arrow(t)
    out1 = weighted_sample(ds, {"en": 0.25, "de": 1.0}).to_pandas()
    out2 = weighted_sample(ds, {"en": 0.25, "de": 1.0}).to_pandas()
    a = out1.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                                 # deterministic
    en = a[a["lang"] == "en"]
    assert len(a[a["lang"] == "de"]) == n // 2         # rate 1.0 keeps all
    assert abs(len(en) / (n // 2) - 0.25) < 0.05       # ~25% of en
    none = weighted_sample(ds, {"en": 0.0, "de": 0.0}).to_pandas()
    assert len(none) == 0


def test_unigram_nll_model_and_scoring(ray_session):
    """Fit/score parity with a hand-computed model: top-V cut, OOV floor,
    mean NLL; docs with no ASCII tokens are dropped."""
    import math

    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.lm import unigram_nll

    # corpus: 6x "aa", 3x "bb", 1x "cc"  (total 10 tokens)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["aa aa aa bb", "aa aa aa bb bb cc", "", "!!!"],
                         pa.string()),
    })
    out = unigram_nll(rd.from_arrow(t), top_v=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]            # empty/no-token drop
    # vocab = {aa:6, bb:3}; cc is OOV (alpha 0.5); total stays 10
    nll = {"aa": -math.log(6 / 10), "bb": -math.log(3 / 10)}
    oov = -math.log(0.5 / 10)
    exp1 = (3 * nll["aa"] + nll["bb"]) / 4
    exp2 = (3 * nll["aa"] + 2 * nll["bb"] + oov) / 6
    assert out["n_toks"].tolist() == [4, 6]
    assert out["n_oov"].tolist() == [0, 1]
    assert np.allclose(out["avg_nll"], [exp1, exp2])


def test_chunk_documents_windows(ray_session):
    """Window boundaries, ragged tail, empty-doc drop, text payload."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.chunking import chunk_documents

    toks = [f"w{i}" for i in range(10)]
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([" ".join(toks), "solo", "   "], pa.string()),
    })
    out = chunk_documents(rd.from_arrow(t), seq_len=4).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 1, 1, 2]      # 10 toks -> 3 windows
    assert out["n_chunk_tokens"].tolist() == [4, 4, 2, 1]
    assert out["chunk_text"].tolist() == [
        "w0 w1 w2 w3", "w4 w5 w6 w7", "w8 w9", "solo"]


def test_pack_sequences_prefix_scan(ray_session):
    """Cross-doc packing == single-process exclusive cumsum at any
    partitioning; empty docs occupy zero tokens but keep a row."""
    import numpy as np
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.chunking import pack_sequences

    rng = np.random.default_rng(13)
    n = 200
    texts = [" ".join("t" * 1 for _ in range(int(k)))
             for k in rng.integers(0, 40, size=n)]
    texts[7] = "   "                      # whitespace-only → 0 tokens
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    for parts in (1, 7):
        out = pack_sequences(rd.from_arrow(t).repartition(parts),
                             ctx_len=32, n_parts=5).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        n_tok = np.array([len(x.split()) for x in texts], dtype=np.int64)
        cum_prev = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        assert out["n_tokens"].tolist() == n_tok.tolist()
        assert out["seq_id"].tolist() == (cum_prev // 32).tolist()
        assert out["seq_offset"].tolist() == (cum_prev % 32).tolist()


def test_tfidf_topk_ranking(ray_session):
    """df fit, idf math, vocab cut, and deterministic tie ordering."""
    import math

    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.tfidf import tfidf_topk

    # 4 docs; "common" in all, "rare" in one, "mid" in two
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "common common rare mid",
            "common mid",
            "common",
            "common",
        ], pa.string()),
    })
    out = tfidf_topk(rd.from_arrow(t), k=2, top_v=10).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    # doc1: rare tf=1 idf=ln4 ; mid tf=1 idf=ln2 ; common tf=2 idf=0
    assert d1["term"].tolist() == ["rare", "mid"]
    assert np.allclose(d1["tfidf"], [math.log(4), math.log(2)], atol=1e-6)
    # doc3/doc4: only "common", tfidf 0, still emitted (k>n_terms ok)
    assert out[out["doc_id"] == 3]["term"].tolist() == ["common"]
    # vocab cut: top_v=1 keeps only the highest-df word ("common")
    cut = tfidf_topk(rd.from_arrow(t), k=2, top_v=1).to_pandas()
    assert set(cut["term"]) == {"common"}


def test_grouped_quantiles_disc_semantics(ray_session):
    """quantile_disc rule (ceil(q*n)-th smallest) on a known histogram."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.textstats import grouped_quantiles

    vals = list(range(1, 11)) + [5, 5, 5]          # group b: skewed
    t = pa.table({
        "g": pa.array(["a"] * 10 + ["b"] * 3, pa.string()),
        "v": pa.array(list(range(1, 11)) + [7, 7, 9], pa.int64()),
    })
    del vals
    out = grouped_quantiles(rd.from_arrow(t), "g", "v") \
        .set_index("g")
    # group a = 1..10: p50 -> 5th = 5, p90 -> 9th = 9, p99 -> 10th = 10
    assert out.loc["a", ["q50", "q90", "q99"]].tolist() == [5, 9, 10]
    # group b = [7,7,9]: p50 -> ceil(1.5)=2nd = 7, p90/p99 -> 3rd = 9
    assert out.loc["b", ["q50", "q90", "q99"]].tolist() == [7, 9, 9]
    assert out["n_rows"].tolist() == [10, 3]


def test_hash_join_inner_left_and_collisions(ray_session):
    """Bucketed hash join: inner/left semantics, string keys, and the
    non-key collision guard."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import hash_join

    l = rd.from_arrow(pa.table({
        "k": pa.array(["x", "y", "y", "z"], pa.string()),
        "lv": pa.array([1, 2, 3, 4], pa.int64())}))
    r = rd.from_arrow(pa.table({
        "k2": pa.array(["y", "z", "w"], pa.string()),
        "rv": pa.array([20, 30, 40], pa.int64())}))
    inner = hash_join(l, r, on="k", right_on="k2", n_parts=8) \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert inner["k"].tolist() == ["y", "y", "z"]
    assert inner["rv"].astype(int).tolist() == [20, 20, 30]
    left = hash_join(l, r, on="k", right_on="k2", n_parts=8, how="left") \
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    assert len(left) == 4 and left["rv"].isna().sum() == 1
    with pytest.raises(ValueError, match="collision"):
        hash_join(l, rd.from_arrow(pa.table({
            "k2": pa.array(["y"]), "lv": pa.array([9], pa.int64())})),
            on="k", right_on="k2")


def test_hash_join_chains_over_pandas_blocks(ray_session):
    """A join's output (pandas blocks from map_groups) feeds a second
    join — the schema handling must accept both block types."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import hash_join

    a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                                "av": pa.array([10, 20, 30], pa.int64())}))
    b = rd.from_arrow(pa.table({"k": pa.array([2, 3], pa.int64()),
                                "bv": pa.array([200, 300], pa.int64())}))
    c = rd.from_arrow(pa.table({"k": pa.array([3], pa.int64()),
                                "cv": pa.array([3000], pa.int64())}))
    ab = hash_join(a, b, on="k", n_parts=4)
    abc = hash_join(ab, c, on="k", n_parts=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert abc["k"].tolist() == [3]
    assert abc["av"].tolist() == [30] and abc["cv"].tolist() == [3000]


def test_adaptive_join_both_paths(ray_session):
    """adaptive_join: broadcast path == hash_join fallback for every
    `how`, and the Q3 pipeline's exchange fallback == its broadcast
    path."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import adaptive_join

    big = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 4], pa.int64()),
        "bv": pa.array([10, 20, 21, 30, 40], pa.int64())}))
    small = rd.from_arrow(pa.table({
        "k2": pa.array([2, 3, 9], pa.int64()),
        "sv": pa.array([200, 300, 900], pa.int64())}))
    for how in ("inner", "left", "semi", "anti"):
        fast = adaptive_join(big, small, on="k", right_on="k2", how=how,
                             broadcast_limit=100).to_pandas()
        slow = adaptive_join(big, small, on="k", right_on="k2", how=how,
                             broadcast_limit=0, n_parts=4).to_pandas()
        cols = sorted(fast.columns)
        fast = fast[cols].sort_values(cols).reset_index(drop=True)
        slow = slow[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False), how


def test_shipping_priority_fallback_path(ray_session, sf_dir):
    """Q3's exchange fallback (surviving orders 'too big' to broadcast)
    produces the same top-k as the broadcast fast path."""
    from stimson_web_scraper_ray.pipelines.analytics import (
        shipping_priority)

    fast = shipping_priority(sf_dir)
    slow = shipping_priority(sf_dir, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False)


def test_hash_join_int64_exact_above_2_53(ray_session):
    """64-bit payloads survive every join type bit-exactly at the
    DATASET level (review finding: null-padding plus the pandas hops
    collapsed distinct values above 2^53 — 64-bit hash ids, the norm
    for the graph/dedup callers — with no error). Checked via arrow
    refs because a final .to_pandas() on a nullable int column is
    pandas' own float64 upcast, outside the join's contract."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from stimson_web_scraper_ray.pipelines.join import asof_join, hash_join

    big = (1 << 62) + 12345
    l = rd.from_pandas(pd.DataFrame({
        "k": [1, 2, 3],
        "lv": np.array([big, big + 1, big + 2], dtype=np.int64)}))
    r = rd.from_pandas(pd.DataFrame({
        "k": [1, 2],
        "rv": np.array([big + 10, big + 11], dtype=np.int64)}))
    for how in ("inner", "left", "full"):
        t = pa.concat_tables([ray.get(rf) for rf in hash_join(
            l, r, on="k", how=how, n_parts=2).to_arrow_refs()])
        got = dict(zip(t["k"].to_pylist(), t["rv"].to_pylist()))
        assert got[1] == big + 10 and got[2] == big + 11, how
        lvs = dict(zip(t["k"].to_pylist(), t["lv"].to_pylist()))
        assert lvs[1] == big and lvs[2] == big + 1, how
        if how in ("left", "full"):
            assert got[3] is None and lvs[3] == big + 2, how
    # asof: unmatched-left NaN padding must not round the payloads
    le = rd.from_pandas(pd.DataFrame({
        "u": [1, 1], "ts": [10, 20],
        "lv": np.array([big, big + 1], dtype=np.int64)}))
    ri = rd.from_pandas(pd.DataFrame({
        "u": [1], "ts": [5],
        "rv": np.array([big + 7], dtype=np.int64)}))
    blocks = [ray.get(rf) for rf in asof_join(
        le, ri, on="ts", by="u", n_parts=2).to_arrow_refs()]
    t = pa.concat_tables([b for b in blocks if b.num_columns])
    assert set(t["rv"].to_pylist()) == {big + 7}
    assert set(t["lv"].to_pylist()) == {big, big + 1}


def test_hash_join_semi_anti(ray_session):
    """Semi/anti: left rows with/without a right match, left columns
    only, duplicate right keys don't multiply rows; all-match anti is
    empty; no-match semi is empty."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import hash_join

    l = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 21, 30], pa.int64())}))
    r = rd.from_arrow(pa.table({
        "k2": pa.array([2, 2, 9], pa.int64()),
        "rv": pa.array([5, 6, 7], pa.int64())}))
    semi = hash_join(l, r, on="k", right_on="k2", n_parts=4, how="semi") \
        .to_pandas().sort_values("lv").reset_index(drop=True)
    assert semi.columns.tolist() == ["k", "lv"]
    assert semi["lv"].tolist() == [20, 21]
    anti = hash_join(l, r, on="k", right_on="k2", n_parts=4, how="anti") \
        .to_pandas().sort_values("lv").reset_index(drop=True)
    assert anti["lv"].tolist() == [10, 30]
    # boundary shapes
    all_r = rd.from_arrow(pa.table({"k2": pa.array([1, 2, 3], pa.int64())}))
    assert hash_join(l, all_r, on="k", right_on="k2", n_parts=4,
                     how="anti").count() == 0
    none_r = rd.from_arrow(pa.table({"k2": pa.array([99], pa.int64())}))
    assert hash_join(l, none_r, on="k", right_on="k2", n_parts=4,
                     how="semi").count() == 0


def test_grouped_topk_rank_and_ties(ray_session):
    """grouped_topk == row_number() semantics: rank is 1-based within
    group, ties broken by tie_cols asc, k bound respected."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.shuffle import grouped_topk

    t = pa.table({
        "g": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "v": pa.array([5.0, 5.0, 3.0, 9.0, 1.0]),
        "id": pa.array([7, 3, 1, 4, 5], pa.int64())})
    out = grouped_topk(
        rd.from_arrow(t), ["g"], "v", k=2,
        combine_key=lambda b: b["g"].to_numpy().astype("int64"),
        tie_cols=["id"], rank_col="rn", n_parts=4) \
        .to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
    # group 1: v=5 tie -> id 3 first, then id 7; v=3 row cut by k=2
    assert out[["g", "id", "rn"]].values.tolist() == [
        [1, 3, 1], [1, 7, 2], [2, 4, 1], [2, 5, 2]]


def test_rolling_window_tie_and_boundary(ray_session, tmp_path):
    """RANGE-frame parity: same-ts peers count together; a row exactly
    window-width earlier is INCLUDED (closed boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import (
        rolling_user_counts,
    )

    ts = pd.to_datetime([
        "2024-01-01 10:00:00",      # u1
        "2024-01-01 11:00:00",      # u1: exactly 1h later -> includes 10:00
        "2024-01-01 11:00:00",      # u1: peer of previous (same ts)
        "2024-01-01 12:00:01",      # u1: window (11:00:01, 12:00:01] -> only self
        "2024-01-01 10:30:00",      # u2
    ])
    t = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "value": pa.array([0.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = rolling_user_counts(str(d)).to_pandas() \
        .sort_values(["user_id", "ts"]).reset_index(drop=True)
    # rows collapse to distinct (user, ts): u1@10:00 ->1, u1@11:00 ->3
    # (both peers + the 10:00 row at the closed boundary), u1@12:00:01 ->1
    assert out["n_window"].tolist() == [1, 3, 1, 1]


def test_pagerank_star_graph(ray_session):
    """4-node undirected star (hub 0 — leaves 1,2,3): the hub must
    out-rank the leaves, leaves are symmetric, and mass is conserved
    (sum = 1 for a graph with no dangling nodes). Exact closed form
    after any number of iterations: leaves stay equal; hub gets
    0.15/4 + 0.85 * 3*leaf (every leaf's whole mass flows to the hub)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import pagerank

    pairs = [(0, 1), (0, 2), (0, 3)]
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    df = pagerank(edges, damping=0.85, iters=3)
    assert df["node_id"].tolist() == [0, 1, 2, 3]
    scores = df["score"].to_numpy()
    assert abs(scores.sum() - 1.0) < 1e-9
    assert np.allclose(scores[1:], scores[1])        # leaf symmetry
    assert scores[0] > scores[1]                     # hub dominates
    # hand-rolled power iteration as the independent reference
    r = np.full(4, 0.25)
    deg = np.array([3.0, 1.0, 1.0, 1.0])
    A = np.zeros((4, 4))
    for a, b in pairs:
        A[b, a] = 1
        A[a, b] = 1
    for _ in range(3):
        r = 0.15 / 4 + 0.85 * (A @ (r / deg))
    assert np.allclose(scores, r, atol=1e-12)


def test_pagerank_distributed_path_matches_broadcast(ray_session):
    """node_broadcast_limit=0 forces the web-scale path (ranks/degrees
    as Datasets, hash_join + salted dst-sum per iteration, no
    node-scaled driver state). It must reproduce the broadcast path to
    float64 summation-order noise on a random graph WITH sinks (dst
    range exceeds src range, so the dangling-mass term is exercised)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(31)
    src = rng.integers(0, 60, 400).astype("int64")
    dst = rng.integers(0, 75, 400).astype("int64")
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    a = pagerank(edges, damping=0.85, iters=3)
    b = pagerank(edges, damping=0.85, iters=3, node_broadcast_limit=0)
    assert a["node_id"].tolist() == b["node_id"].tolist()
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy(),
                       atol=1e-12)
    assert abs(b["score"].sum() - 1.0) < 1e-9    # mass conserved


def test_hits_distributed_path_matches_broadcast(ray_session):
    """node_broadcast_limit=0 forces the Dataset-resident HITS path
    (scores as Datasets, hash_join per half-iteration, L2 norm reduced
    as a Dataset scalar). It must reproduce the broadcast path to
    summation-order noise on a random directed graph with nodes that
    have only in-edges (pure authorities) and only out-edges (pure
    hubs) — both zero-score cases exercised."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import hits

    rng = np.random.default_rng(47)
    src = rng.integers(0, 50, 300).astype("int64")
    dst = rng.integers(30, 90, 300).astype("int64")
    edges = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    a = hits(edges, iters=3)
    b = hits(edges, iters=3, node_broadcast_limit=0)
    assert a["node_id"].tolist() == b["node_id"].tolist()
    assert np.allclose(a["authority"].to_numpy(),
                       b["authority"].to_numpy(), atol=1e-12)
    assert np.allclose(a["hub"].to_numpy(), b["hub"].to_numpy(),
                       atol=1e-12)
    # L2-normalized: both vectors are unit length after the last round
    assert abs(np.linalg.norm(a["authority"]) - 1.0) < 1e-9
    assert abs(np.linalg.norm(a["hub"]) - 1.0) < 1e-9


def test_percent_rank_by_group_matches_pandas(ray_session):
    """percent_rank_by_group == pandas rank(method='min') algebra on
    random data with HEAVY ties (few distinct values, so tie-runs cross
    value-range partitions' row blocks), multiple groups including a
    single-row group (percent_rank = 0.0 by convention), at several
    block layouts — the two-phase scan must be layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import (
        percent_rank_by_group)

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "id": np.arange(900, dtype="int64"),
        "g": rng.choice(["en", "fr", "zh"], 900),
        "v": rng.integers(0, 25, 900).astype("int64"),  # heavy ties
    })
    df.loc[0, "g"] = "solo"                  # single-row group
    want = df.copy()
    want["pct"] = (want.groupby("g")["v"].rank(method="min") - 1) / \
        (want.groupby("g")["v"].transform("size") - 1).clip(lower=1)
    want.loc[want.groupby("g")["v"].transform("size") == 1, "pct"] = 0.0
    for parts in (1, 4, 13):
        ds = rd.from_pandas(df).repartition(parts)
        got = percent_rank_by_group(ds, "g", "v", out_col="pct",
                                    n_parts=6).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        assert np.allclose(got["pct"].to_numpy(),
                           want["pct"].to_numpy(), atol=1e-12), parts
        assert got["id"].tolist() == want["id"].tolist()


def test_ppm_codec_roundtrip_and_stages(ray_session):
    """The PPM (P6) codec is REAL: encode→decode is bit-exact (incl.
    header comments), the decode stage reports the true dims of PPM
    rows, and the resize stage emits an openable PPM thumbnail whose
    pixels match direct nearest-neighbor indexing."""
    import numpy as np
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.multimodal import (
        PPM_MIME,
        ImageResize,
        decode_pipeline,
        decode_ppm,
        encode_ppm,
        synth_media_table,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # spec quirks: comment lines and multi-whitespace in the header
    quirky = b"P6\n# a comment\n 7\t11 \n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(quirky), img)

    tbl = synth_media_table(n=16)
    ds = rd.from_arrow(tbl)
    feats = decode_pipeline(ds, fake=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for i in range(0, 16, 2):                       # even ids are real PPM
        truth = decode_ppm(tbl["payload"][i].as_py())
        assert feats.loc[i, "height"] == truth.shape[0]
        assert feats.loc[i, "width"] == truth.shape[1]
        assert np.allclose(
            feats.loc[i, "channel_mean"],
            np.round(truth.reshape(-1, 3).mean(axis=0), 2))

    out = ds.map_batches(
        ImageResize, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 2),
        fn_constructor_kwargs={"out_w": 4, "out_h": 4, "fake": True})
    thumbs = out.to_pandas().sort_values("media_id").reset_index(drop=True)
    src = decode_ppm(tbl["payload"][0].as_py())
    h, w = src.shape[0], src.shape[1]
    yi = (np.arange(4) * h) // 4
    xi = (np.arange(4) * w) // 4
    expect = src[yi][:, xi]
    got = decode_ppm(thumbs.loc[0, "payload"])      # openable PPM out
    assert thumbs.loc[0, "mime"] == PPM_MIME
    assert np.array_equal(got, expect)


def test_wav_codec_roundtrip_and_features(ray_session):
    """The WAV (PCM-16) codec is REAL: decode(encode(x)) ≈ x within one
    quantization step, and the audio stage's duration/rms on WAV rows
    match direct computation from the decoded waveform."""
    import numpy as np
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.multimodal import (
        AudioFeatures,
        decode_wav,
        encode_wav,
        synth_audio_table,
    )

    rng = np.random.default_rng(5)
    x = (rng.random(4000) * 2 - 1).astype(np.float32) * 0.9
    y, sr = decode_wav(encode_wav(x, 8000))
    assert sr == 8000
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) <= 1.5 / 32767

    tbl = synth_audio_table(n=8)
    ds = rd.from_arrow(tbl)
    out = ds.map_batches(AudioFeatures, batch_format="pyarrow",
                         batch_size=4, concurrency=(1, 2),
                         fn_constructor_kwargs={"fake": True}) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    for i in range(0, 8, 2):                        # even ids = real WAV
        w, srr = decode_wav(tbl["payload"][i].as_py())
        assert out.loc[i, "duration_s"] == round(len(w) / srr, 6)
        assert out.loc[i, "rms"] == round(float(np.sqrt(np.mean(w * w))), 6)


def test_order_rank_windows_tie_semantics(ray_session, tmp_path):
    """Planted totalprice ties: rank repeats-and-skips, dense_rank
    repeats-without-skip, row_number/ntile break ties by orderkey —
    verified directly against DuckDB's window functions on the same
    frame."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import (
        order_rank_windows,
    )

    t = pa.table({
        "o_custkey": pa.array([1] * 5 + [2] * 3, pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 20, 21, 22], pa.int64()),
        # cust 1: two pairs of ties; cust 2: all equal
        "o_totalprice": pa.array([5.0, 9.0, 9.0, 5.0, 1.0,
                                  7.0, 7.0, 7.0], pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "orders.parquet")
    got = order_rank_windows(str(d)).to_pandas() \
        .sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
    want = duckdb.sql("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(rank() OVER w1 AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w1 AS BIGINT) AS drnk,
               CAST(row_number() OVER w2 AS BIGINT) AS rn,
               CAST(ntile(4) OVER w2 AS BIGINT) AS quartile
        FROM t
        WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
               w2 AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_custkey, o_orderkey
    """).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pagerank_sink_nodes_handled(ray_session):
    """A directed graph with sinks (in-edges, no out-edges) must score
    every node — sinks included — with the standard dangling-mass
    redistribution, verified against a hand-rolled dense power
    iteration. (Previously: IndexError or silent mis-crediting.)"""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import pagerank

    # 0 -> 1, 2 -> 0, 2 -> 1 : node 1 is a pure sink
    src = [0, 2, 2]
    dst = [1, 0, 1]
    edges = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                    "dst": pa.array(dst, pa.int64())}))
    df = pagerank(edges, damping=0.85, iters=4)
    assert df["node_id"].tolist() == [0, 1, 2]
    scores = df["score"].to_numpy()
    assert abs(scores.sum() - 1.0) < 1e-9          # mass conserved

    n = 3
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[b, a] = 1
    deg = A.sum(axis=0)
    r = np.full(n, 1 / n)
    for _ in range(4):
        dangling = r[deg == 0].sum()
        contrib = A @ np.where(deg > 0, r / np.where(deg > 0, deg, 1), 0)
        r = 0.15 / n + 0.85 * (contrib + dangling / n)
    assert np.allclose(scores, r, atol=1e-12)


def test_multimodal_corrupt_payload_isolated(ray_session):
    """A truncated PPM / WAV payload degrades to a decode_ok=False row;
    the neighbors in the same block decode normally."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.multimodal import (
        PPM_MIME,
        WAV_MIME,
        AudioFeatures,
        ImageDecodeFeatures,
        ImageResize,
        encode_ppm,
        encode_wav,
    )

    img = np.arange(6 * 5 * 3, dtype=np.uint8).reshape(6, 5, 3)
    good_ppm = encode_ppm(img)
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "mime": pa.array([PPM_MIME] * 3, pa.string()),
        "payload": pa.array([good_ppm, good_ppm[:10], b"P6 garbage"],
                            pa.binary()),
        "meta": pa.array(["{}"] * 3, pa.string()),
    })
    for stage in (ImageDecodeFeatures(fake=False),
                  ImageResize(out_w=2, out_h=2, fake=False)):
        out = stage(tbl)
        assert out.num_rows == 3
        assert out["decode_ok"].to_pylist() == [True, False, False]

    wav = encode_wav(np.zeros(100) + 0.5, 8000)
    atbl = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "mime": pa.array([WAV_MIME] * 2, pa.string()),
        "payload": pa.array([wav, wav[:20]], pa.binary()),
        "meta": pa.array(["{}"] * 2, pa.string()),
    })
    aout = AudioFeatures(fake=False)(atbl)
    assert aout["decode_ok"].to_pylist() == [True, False]
    assert aout["duration_s"][0].as_py() > 0


def test_multimodal_degenerate_headers_isolated(ray_session):
    """Legal-but-degenerate headers (0x0 PPM, framerate-0 WAV) degrade
    to decode_ok=False rows with truthful zero dims — not crashes."""
    import numpy as np
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.multimodal import (
        PPM_MIME,
        WAV_MIME,
        AudioFeatures,
        ImageDecodeFeatures,
        ImageResize,
        encode_ppm,
        encode_wav,
    )

    zero_ppm = b"P6\n0 0\n255\n"
    good = encode_ppm(np.ones((4, 4, 3), np.uint8))
    tbl = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "mime": pa.array([PPM_MIME] * 2, pa.string()),
        "payload": pa.array([zero_ppm, good], pa.binary()),
        "meta": pa.array(["{}"] * 2, pa.string()),
    })
    feats = ImageDecodeFeatures(fake=False)(tbl)
    assert feats["decode_ok"].to_pylist() == [False, True]
    thumbs = ImageResize(out_w=2, out_h=2, fake=False)(tbl)
    assert thumbs["decode_ok"].to_pylist() == [False, True]
    assert thumbs["width"].to_pylist() == [0, 2]       # dims don't lie

    # framerate-0 WAV: the writer refuses it, but a hostile/corrupt file
    # can carry it — patch the 4-byte LE rate field (offset 24) to 0
    bad_wav = bytearray(encode_wav(np.zeros(50), 8000))
    assert bad_wav[24:28] == (8000).to_bytes(4, "little")
    bad_wav[24:28] = (0).to_bytes(4, "little")
    atbl = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "mime": pa.array([WAV_MIME] * 2, pa.string()),
        "payload": pa.array([bytes(bad_wav),
                             encode_wav(np.zeros(64) + 0.25, 8000)],
                            pa.binary()),
        "meta": pa.array(["{}"] * 2, pa.string()),
    })
    aout = AudioFeatures(fake=False)(atbl)
    assert aout["decode_ok"].to_pylist() == [False, True]


def test_event_value_stats_constant_group(ray_session, tmp_path):
    """Constant-valued group: float cancellation must clamp to stddev 0
    (matching SQL stddev_samp), not NaN."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import (
        event_value_stats,
    )

    ts = pa.array(pd.to_datetime(
        ["2024-01-01 03:00:00"] * 3 + ["2024-01-01 05:00:00"]),
        pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": ts,
        "user_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["click"] * 3 + ["view"], pa.string()),
        "value": pa.array([0.1, 0.1, 0.1, 2.0], pa.float64()),
        "props": pa.array(["{}"] * 4, pa.string()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = event_value_stats(str(d))
    click = got[got["event_type"] == "click"].iloc[0]
    assert click["stddev_value"] == 0.0                # clamped, not NaN
    view = got[got["event_type"] == "view"].iloc[0]
    import numpy as np
    assert np.isnan(view["stddev_value"])              # n==1 → SQL NULL
    assert np.isnan(click["corr_value_hour"])          # zero variance


def test_empty_inputs_are_graceful(ray_session):
    """Zero-row inputs (zero-block Datasets lose their schema through
    map_batches→to_pandas) must return clean empty results everywhere."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import pagerank

    empty_edges = rd.from_arrow(pa.table({
        "src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}))
    pr = pagerank(empty_edges)
    assert len(pr) == 0 and list(pr.columns) == ["node_id", "score"]

    empty_vecs = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    tk = similarity.brute_force_topk(empty_vecs, np.zeros((2, 4)), k=3)
    assert len(tk) == 0


# ---------------------------------------------------------------------------
# SemDeDup family: distributed k-means + within-cluster cosine dedup
# ---------------------------------------------------------------------------

def test_kmeans_fit_monotone_and_deterministic(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    c1, inertia = similarity.kmeans_fit(ds, n_clusters=8, iters=6)
    assert len(inertia) >= 1
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a * (1 + 1e-9) + 1e-12       # Lloyd's invariant
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)  # spherical
    c2, _ = similarity.kmeans_fit(ds, n_clusters=8, iters=6)
    assert np.allclose(c1, c2)                   # hash sample → stable fit


def test_semdedup_planted_clusters(ray_session):
    # two well-separated directions; each has one base + 2 near-copies
    rng = np.random.default_rng(3)
    base = np.array([[1.0] + [0.0] * 15, [0.0] * 15 + [1.0]])
    ids, vecs = [], []
    for g in range(2):
        for c in range(3):
            ids.append(g * 10 + c)
            vecs.append(base[g] + rng.normal(scale=0.01, size=16))
    # background points far from both
    for i in range(50):
        ids.append(100 + i)
        v = rng.normal(size=16)
        vecs.append(v)
    ds = rd.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [list(v) for v in vecs]}))
    out = dedup.semdedup(ds, threshold=0.98, n_clusters=4).to_pandas()
    assert sorted(out["vec_id"]) == sorted(ids)  # every vector decided once
    kept = set(out.loc[out["keep"], "vec_id"])
    # keep-first-in-id-order: the base of each planted group survives,
    # its two near-copies do not
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert 10 in kept and 11 not in kept and 12 not in kept


def test_semdedup_precision_exact_recall_floor(ray_session, sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    truth = dedup.exact_cosine_pairs(ds, threshold=0.4)
    truth_removed = set(truth["b"].astype(int))
    out = dedup.semdedup(ds, threshold=0.4, n_clusters=8).to_pandas()
    pred_removed = set(out.loc[~out["keep"], "vec_id"].astype(int))
    assert pred_removed <= truth_removed         # precision exactly 1.0
    assert len(pred_removed & truth_removed) / max(1, len(truth_removed)) \
        >= 0.7   # 2-probe assignment; measured 0.83-0.87
    # single-probe loses boundary pairs but must stay a subset
    one = dedup.semdedup(ds, threshold=0.4, n_clusters=8,
                         n_probes=1).to_pandas()
    one_removed = set(one.loc[~one["keep"], "vec_id"].astype(int))
    assert one_removed <= pred_removed


def test_kmeans_partials_exchange_path_matches_driver(ray_session, sf_dir):
    """partials_driver_limit=0 forces the salted cid pre-reduce (the
    path for block-counts where driver-side partials would not fit);
    centroids and inertia must match the driver-reduce path to float
    reduce-order noise."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    c1, i1 = similarity.kmeans_fit(ds, n_clusters=8, iters=4)
    c2, i2 = similarity.kmeans_fit(ds, n_clusters=8, iters=4,
                                   partials_driver_limit=0)
    assert np.allclose(c1, c2, atol=1e-9)
    assert np.allclose(i1, i2, atol=1e-6)


# ---------------------------------------------------------------------------
# Distributed BPE training
# ---------------------------------------------------------------------------

def _reference_bpe(texts, n_merges, min_pair_freq=2):
    """Pure-python classic BPE (Sennrich-style) over [a-z]+ words —
    the independent oracle for the distributed trainer."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z]+", t.lower()))
    words = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            f = wf[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), cnt = best
        if cnt < min_pair_freq:
            break
        merges.append((a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges, len(wf)


def test_bpe_train_matches_reference(ray_session, sf_dir):
    from stimson_web_scraper_ray.pipelines import bpe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = ds.to_pandas()["text"].tolist()
    exp_merges, exp_words = _reference_bpe(texts, n_merges=12)
    stats = {}
    got_merges, got_words = bpe.bpe_train(ds, n_merges=12, stats=stats)
    assert got_words == exp_words
    assert got_merges == exp_merges          # order, pairs AND counts
    # the batched schedule actually batches: fewer exchanges than merges
    assert stats["rounds"] < len(got_merges)


def test_bpe_batched_schedule_equals_sequential(ray_session, sf_dir):
    """Every batch cap (1 = pure sequential … unbounded) yields the
    identical merge sequence — the commuting-batch selection is exact,
    not approximate."""
    from stimson_web_scraper_ray.pipelines import bpe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    seq, _ = bpe.bpe_train(ds, n_merges=15, max_round_merges=1)
    for cap in (2, 5, 64):
        got, _ = bpe.bpe_train(ds, n_merges=15, max_round_merges=cap)
        assert got == seq, f"cap={cap}"


def test_bpe_train_parallelism_invariant(ray_session, sf_dir):
    """Same merges regardless of block layout (canonical tie-break)."""
    from stimson_web_scraper_ray.pipelines import bpe

    ds1 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["text"], override_num_blocks=1)
    ds7 = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["text"], override_num_blocks=7)
    m1, _ = bpe.bpe_train(ds1, n_merges=8)
    m7, _ = bpe.bpe_train(ds7, n_merges=8)
    assert m1 == m7


def test_bpe_tokenizer_matches_training_segmentation(ray_session, sf_dir):
    """Greedy rank-order application must reproduce the training-time
    segmentation: for every distinct corpus word, the tokenizer's count
    equals the word's final symbol count in the reference trainer."""
    import re
    from collections import Counter

    from stimson_web_scraper_ray.pipelines import bpe

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    texts = ds.to_pandas()["text"].tolist()
    merges, _ = bpe.bpe_train(ds, n_merges=12)
    # reference final segmentation (reuse the oracle trainer's loop)
    wf = Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z]+", t.lower()))
    words = {w: list(w) + ["</w>"] for w in wf}
    for a, b, _ in merges:
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    tok = bpe.BpeTokenizer(merges=merges)
    for w, syms in words.items():
        assert tok._n_tokens(w) == len(syms), w
    # and the distributed batch path sums per-doc counts consistently
    counts = bpe.bpe_token_counts(ds, merges).to_pandas()
    assert len(counts) == len(texts)
    exp_total = sum(len(words[w]) * f for w, f in wf.items())
    assert int(counts["bpe_tokens"].sum()) == exp_total


def test_inverted_index_and_search(ray_session):
    """Posting lists are sorted distinct doc ids; conjunctive search is
    the exact AND set regardless of how postings explode across blocks
    (duplicate terms within a doc ship once; a term in every doc
    intersects to every doc)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        search_and,
        top_terms,
    )

    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "alpha beta"),
        (2, "beta gamma delta"),
        (3, "alpha gamma"),
        (4, ""),
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=3)
    idx = build_inverted_index(ds, n_parts=5).materialize()
    rows = {r["term"]: (r["df"], list(r["postings"]))
            for r in idx.take_all()}
    assert rows["alpha"] == (3, [0, 1, 3])
    assert rows["beta"] == (3, [0, 1, 2])
    assert rows["gamma"] == (3, [0, 2, 3])
    assert rows["delta"] == (1, [2])

    assert top_terms(idx, 2) == ["alpha", "beta"]
    got = [r["doc_id"] for r in search_and(idx, ["alpha", "beta"]).take_all()]
    assert got == [0, 1]
    got = [r["doc_id"]
           for r in search_and(idx, ["alpha", "beta", "gamma"]).take_all()]
    assert got == [0]
    assert search_and(idx, ["delta", "alpha"]).count() == 0


def test_inverted_index_partitioned_sink_and_pruned_lookup(ray_session,
                                                           tmp_path):
    """write_inverted_index persists term-hash partitions; lookup_terms
    reads only the partitions its terms hash to and returns the same
    postings the in-memory index holds."""
    import os

    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        lookup_terms,
        write_inverted_index,
    )

    docs = [(i, f"common word{i % 3} tail{i}") for i in range(12)]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=3)
    idx = build_inverted_index(ds, n_parts=4).materialize()
    out = str(tmp_path / "idx")
    write_inverted_index(idx, out, n_partitions=8)
    assert any(n.startswith("part=") for n in os.listdir(out))

    got = lookup_terms(out, ["common", "word1", "absent"], n_partitions=8)
    rows = {r["term"]: (r["df"], list(r["postings"]))
            for _, r in got.iterrows()}
    assert set(rows) == {"common", "word1"}
    assert rows["common"] == (12, list(range(12)))
    assert rows["word1"] == (4, [1, 4, 7, 10])


def test_bm25_ranking_semantics(ray_session):
    """BM25 orders by relevance, not raw tf: a rarer query term
    outweighs a common one, and length normalization penalizes a match
    diluted in a long document."""
    import math

    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        bm25_topk,
        build_inverted_index,
    )

    docs = [
        (0, "rare common"),                      # rare term, short doc
        (1, "common common common"),             # only the common term
        (2, "rare " + "filler " * 60 + "common"),  # rare term, long doc
        (3, "unrelated words only"),
        (4, "common"),
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=2)
    idx = build_inverted_index(ds, n_parts=4).materialize()
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(ds, idx, ["rare", "common"], k=10).take_all()}
    assert 3 not in out                       # no query term -> no score
    assert out[0] > out[1]                    # rare beats tf-heavy common
    assert out[0] > out[2]                    # short doc beats diluted long
    # hand-check doc 4: one common term, dl=1
    n, df_c = 5, 4
    dls = [2, 3, 62, 3, 1]
    avgdl = sum(dls) / n
    idf = math.log(1 + (n - df_c + 0.5) / (df_c + 0.5))
    want = round(idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 1 / avgdl)),
                 4)
    assert out[4] == want


def test_phrase_search_overlapping_and_filtered_tokens(ray_session):
    """Phrase matching uses the bigram tokenization (empties and pure
    numerics dropped BEFORE adjacency) and counts overlapping
    occurrences: 'a b a b a' has two 'a b' hits and 'b a' bridges the
    dropped numeric token."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import phrase_search

    docs = [
        (0, "a b a b a"),          # "a b" twice (overlap window)
        (1, "a 42 b"),             # numeric dropped -> "a b" adjacency
        (2, "a c b"),              # not adjacent
        (3, "b a"),                # reversed
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=2)
    got = {r["doc_id"]: r["n_hits"]
           for r in phrase_search(ds, ["a", "b"]).take_all()}
    assert got == {0: 2, 1: 1}


def test_phrase_search_index_pruned(ray_session):
    """Index-backed phrase search verifies ONLY the conjunctive
    candidates (docs containing every phrase term), and both prune paths
    (broadcast id set, distributed semi-join) return rows identical to
    the full scan."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        phrase_search,
    )

    docs = [
        (0, "x y filler " * 3 + "alpha beta done"),   # hit
        (1, "alpha only here, no second term"),        # pruned out
        (2, "beta without the first term at all"),     # pruned out
        (3, "alpha beta alpha beta"),                  # two hits
        (4, "beta alpha reversed order words"),        # candidate, 0 hits
        (5, "totally unrelated text body"),            # pruned out
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=3)
    idx = build_inverted_index(ds, n_parts=4).materialize()

    scan = phrase_search(ds, ["alpha", "beta"]).take_all()
    st_b, st_j = {}, {}
    fast = phrase_search(ds, ["alpha", "beta"], index_ds=idx,
                         stats=st_b).take_all()
    joined = phrase_search(ds, ["alpha", "beta"], index_ds=idx,
                           broadcast_limit_bytes=0, stats=st_j).take_all()
    assert [dict(r) for r in fast] == [dict(r) for r in scan]
    assert [dict(r) for r in joined] == [dict(r) for r in scan]
    assert {r["doc_id"]: r["n_hits"] for r in scan} == {0: 1, 3: 2}
    # the verify stage saw exactly the 3 candidate docs, not all 6
    assert st_b["path"] == "broadcast" and st_j["path"] == "semi_join"
    for st in (st_b, st_j):
        assert st["n_candidates"] == 3
        assert st["verified_docs"] == 3


def test_dup_substring_spans_planted(ray_session):
    """ExactSubstr spans on planted duplicates: a 60-char string shared
    by two docs marks its full extent in both (one merged span, 60
    chars); a doc with an internal repeat of a 55-char block gets both
    occurrences marked; unique text stays unmarked; sub-threshold
    overlap (< 50 chars) is invisible."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import dup_substring_spans

    shared = "S" * 10 + "the quick brown fox jumps over the lazy dog again!"
    assert len(shared) == 60
    block = "B" + "abcdefghij" * 5 + "CCCC"          # 55 chars
    docs = [
        (0, "x" * 30 + shared + "y" * 30),
        (1, "p" * 10 + shared + "q" * 50),
        (2, "m" * 20 + block + "n" * 20 + block + "o" * 20),
        # non-repetitive filler: a constant run would self-duplicate
        # (any 50-gram of "z"*60 occurs 11 times within the doc)
        (3, "totally unique text " + "".join(
            chr(ord("a") + (7 * i) % 26) + str(i % 10) for i in range(40))),
        (4, "x" * 30 + "the quick brown fox jumps"),  # 25-char overlap only
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=3)
    stats = {}
    out = {r["doc_id"]: (r["n_spans"], r["dup_chars"])
           for r in dup_substring_spans(ds, gram_len=50,
                                        stats=stats).take_all()}
    assert out[0] == (1, 60)
    assert out[1] == (1, 60)
    assert out[2] == (2, 110)
    assert 3 not in out
    assert 4 not in out
    # the count-scan exchange is per-batch-DISTINCT hashes: doc 2's
    # internal repeat collapses, so exchange rows < total gram rows
    corpus_grams = sum(max(0, len(t) - 49) for _, t in docs)
    assert stats["path"] == "broadcast"
    assert 0 < stats["exchange_rows"] < corpus_grams
    assert stats["n_dup_hashes"] > 0


def test_dup_substring_spans_wide_parity(ray_session):
    """The over-budget fallback (positions through the wide exchange)
    returns bit-identical spans to the broadcast path."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import dup_substring_spans

    rng = __import__("random").Random(11)
    base = "".join(rng.choice("abcdefgh ") for _ in range(300))
    dup_block = "".join(rng.choice("ijklmnop ") for _ in range(80))
    docs = [(i, base[i:i + 120] + (dup_block if i % 3 == 0 else "")
             + base[max(0, 200 - i):max(0, 200 - i) + 90])
            for i in range(12)]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=4)
    stats_b, stats_w = {}, {}
    fast = dup_substring_spans(ds, gram_len=50, stats=stats_b).take_all()
    wide = dup_substring_spans(ds, gram_len=50, broadcast_limit_bytes=0,
                               stats=stats_w).take_all()
    assert stats_b["path"] == "broadcast" and stats_w["path"] == "wide"
    assert [dict(r) for r in fast] == [dict(r) for r in wide]
    assert len(fast) > 0


def test_phrase_search_positional_matches_scan(ray_session):
    """Positional-index phrase search (postings-only alignment, corpus
    never re-read) returns exactly the full-scan counts, including a
    REPEATED-term phrase where the (doc, aligned) key receives one row
    per slot and overlap counting matters."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_positional_index,
        phrase_search,
        phrase_search_positional,
    )

    docs = [
        (0, "a b a b a"),          # "a b" twice; "a b a" twice
        (1, "a 42 b"),             # numeric dropped -> adjacency bridges
        (2, "a c b"),
        (3, "b a"),
        (4, "a a a a"),            # "a a" three overlapping hits
        (5, "x y a b a z"),
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=3)
    pos = build_positional_index(ds, n_parts=4).materialize()
    for phrase in (["a", "b"], ["a", "b", "a"], ["a", "a"]):
        scan = {r["doc_id"]: r["n_hits"]
                for r in phrase_search(ds, phrase).take_all()}
        via_index = {r["doc_id"]: r["n_hits"]
                     for r in phrase_search_positional(
                         pos, phrase, n_parts=4).take_all()}
        assert via_index == scan, phrase


def test_search_or_counts(ray_session):
    """Disjunctive search returns every doc with >=1 query term and the
    matched-term count (distinct terms, not occurrences)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        search_or,
    )

    docs = [
        (0, "alpha beta gamma"),
        (1, "alpha alpha alpha"),    # repeated term counts once
        (2, "gamma delta"),
        (3, "nothing relevant"),
    ]
    ds = rd.from_items([{"doc_id": d, "text": t} for d, t in docs],
                       override_num_blocks=2)
    idx = build_inverted_index(ds, n_parts=4).materialize()
    got = {r["doc_id"]: r["n_matched"]
           for r in search_or(idx, ["alpha", "beta"]).take_all()}
    assert got == {0: 2, 1: 1}


def test_bloom_decontaminate_no_false_negatives(ray_session):
    """The Bloom probe flags every doc that truly shares an 8-gram with
    the history (no false negatives — the filter's hard guarantee), and
    at test sizing produces no false positives either."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import (
        _gram_hashes,
        bloom_decontaminate,
    )

    shared = ("one two three four five six seven eight nine ten "
              "eleven twelve")
    hist_docs = [(0, shared + " history tail words here"),
                 (2, "entirely separate history text body with many "
                     "unique words going on and on for a while longer")]
    new_docs = [(1, "prefix words then " + shared),          # true dup
                (3, "no overlap at all in this new document "
                    "completely fresh tokens everywhere")]
    hist = rd.from_items([{"doc_id": d, "text": t} for d, t in hist_docs],
                         override_num_blocks=2)
    new = rd.from_items([{"doc_id": d, "text": t} for d, t in new_docs],
                        override_num_blocks=2)
    out = {r["doc_id"]: r["flagged"]
           for r in bloom_decontaminate(hist, new, n=8).take_all()}
    assert out == {1: True, 3: False}
    # sanity: the planted overlap really is an 8-gram-level overlap
    assert np.intersect1d(_gram_hashes(hist_docs[0][1], 8),
                          _gram_hashes(new_docs[0][1], 8)).size > 0


def test_asof_join_directions_and_nulls(ray_session):
    """Generic asof_join: backward picks the latest at-or-before row per
    key, forward the earliest at-or-after, unmatched left rows keep
    nulls, and non-key column collisions raise."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.join import asof_join

    left = rd.from_items([
        {"k": 1, "t": 10, "lv": "a"},
        {"k": 1, "t": 20, "lv": "b"},
        {"k": 2, "t": 5, "lv": "c"},     # no right row at-or-before
        {"k": 3, "t": 7, "lv": "d"},     # key absent on the right
    ], override_num_blocks=2)
    right = rd.from_items([
        {"k": 1, "t": 10, "rv": 100.0},
        {"k": 1, "t": 15, "rv": 150.0},
        {"k": 2, "t": 8, "rv": 200.0},
    ], override_num_blocks=2)
    back = {(r["k"], r["t"]): r["rv"]
            for r in asof_join(left, right, on="t", by="k",
                               n_parts=4).take_all()}
    assert back[(1, 10)] == 100.0       # exact match allowed
    assert back[(1, 20)] == 150.0       # latest at-or-before
    assert back[(2, 5)] is None
    assert back[(3, 7)] is None
    fwd = {(r["k"], r["t"]): r["rv"]
           for r in asof_join(left, right, on="t", by="k",
                              direction="forward", n_parts=4).take_all()}
    assert fwd[(1, 10)] == 100.0
    assert fwd[(1, 20)] is None         # nothing at-or-after
    assert fwd[(2, 5)] == 200.0
    with pytest.raises(ValueError):
        bad = rd.from_items([{"k": 1, "t": 1, "lv": "x"}])
        asof_join(bad, bad, on="t", by="k")


def test_new_ops_block_layout_invariant(ray_session):
    """kmv_bottomk / asof_join / bloom_decontaminate /
    phrase_search_positional return identical results regardless of
    input block layout — the determinism bar every operator here meets
    (re-runs and retried blocks must not change outputs)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import bloom_decontaminate
    from stimson_web_scraper_ray.pipelines.index import (
        build_positional_index,
        phrase_search_positional,
    )
    from stimson_web_scraper_ray.pipelines.join import asof_join
    from stimson_web_scraper_ray.pipelines.sketch import kmv_bottomk

    rng = np.random.default_rng(5)
    vocab = "aa bb cc dd ee ff gg hh".split()
    docs = [(i, " ".join(rng.choice(vocab, size=40))) for i in range(60)]

    def mk(n_blocks):
        return rd.from_items(
            [{"doc_id": d, "text": t} for d, t in docs],
            override_num_blocks=n_blocks)

    # kmv: same bottom-k rows and estimate for 1 vs 7 blocks
    k1 = kmv_bottomk(mk(1), k=16)
    k7 = kmv_bottomk(mk(7), k=16)
    pd.testing.assert_frame_equal(k1, k7)

    # positional phrase: same counts for 2 vs 6 blocks
    p2 = build_positional_index(mk(2), n_parts=4).materialize()
    p6 = build_positional_index(mk(6), n_parts=4).materialize()
    for phrase in (["aa", "bb"], ["cc", "cc"]):
        a = {r["doc_id"]: r["n_hits"] for r in
             phrase_search_positional(p2, phrase, n_parts=4).take_all()}
        b = {r["doc_id"]: r["n_hits"] for r in
             phrase_search_positional(p6, phrase, n_parts=4).take_all()}
        assert a == b

    # bloom: identical flags for 1 vs 5 history blocks (bitmap OR is
    # commutative/associative — the tree reduce order can't matter)
    hist1, hist5, new = mk(1), mk(5), mk(3)
    f1 = sorted((r["doc_id"], r["flagged"]) for r in
                bloom_decontaminate(hist1, new, n=3).take_all())
    f5 = sorted((r["doc_id"], r["flagged"]) for r in
                bloom_decontaminate(hist5, new, n=3).take_all())
    assert f1 == f5

    # asof: same alignment for different part counts
    left = rd.from_items([{"k": i % 4, "t": i, "lv": i} for i in range(40)],
                         override_num_blocks=3)
    right = rd.from_items([{"k": i % 4, "t": i * 2, "rv": float(i)}
                           for i in range(10)], override_num_blocks=2)
    a = sorted(tuple(sorted(r.items())) for r in
               asof_join(left, right, on="t", by="k", n_parts=2).take_all())
    b = sorted(tuple(sorted(r.items())) for r in
               asof_join(left, right, on="t", by="k", n_parts=16).take_all())
    assert a == b


def test_triangle_counts_known_graph(ray_session):
    """triangle_counts on a hand-checked graph: K4 on {0,1,2,3} (4
    triangles, every node in 3) plus a pendant edge (4,5) and a chord
    path 3-4 (no new triangle) — and the result is block-layout
    invariant."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import triangle_counts

    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    extra = [(3, 4), (4, 5)]
    edges = [{"u": u, "v": v} for u, v in k4 + extra]

    def run(n_blocks, n_parts):
        ds = rd.from_items(edges, override_num_blocks=n_blocks)
        return triangle_counts(ds, n_parts=n_parts)

    out = run(2, 8)
    assert dict(zip(out["node_id"], out["n_triangles"])) == \
        {0: 3, 1: 3, 2: 3, 3: 3}
    pd.testing.assert_frame_equal(out, run(5, 3))


def test_weighted_reservoir_topk_properties(ray_session):
    """A-ES sample: block-layout invariant, exactly k rows, and heavier
    rows are picked far more often (w=1000 vs w=1 strata)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sampling import (
        weighted_reservoir_topk)

    rows = [{"doc_id": i, "n_chars": 1000 if i % 2 == 0 else 1}
            for i in range(400)]

    def run(n_blocks):
        return weighted_reservoir_topk(
            rd.from_items(rows, override_num_blocks=n_blocks), k=40)

    a, b = run(1), run(9)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 40
    heavy = (a["doc_id"] % 2 == 0).sum()
    assert heavy >= 35    # weight ratio 1000:1 -> light picks are rare


def test_anchor_text_rollup_exact(ray_session):
    """DOM-walk anchor rollup == hand-computed truth on synthetic pages:
    per-occurrence counting (repeats are signal), relative-href
    absolutization via prepare_url, inner-trimmed anchor text, poisoned
    html skipped without killing the block, counts layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import anchor_text_rollup

    pages = pd.DataFrame({
        "url": ["http://a.example.com/p1.html",
                "http://a.example.com/p2.html",
                "http://b.example.com/q.html"],
        "html": [
            '<html><body>'
            '<a href="http://t.example.com/x.html">great   article</a> '
            '<a href="/about">about us</a>'
            '<a href="http://t.example.com/x.html">great   article</a>'
            '</body></html>',
            '<html><body>'
            '<a href="http://t.example.com/x.html">must read</a>'
            '<a href="/about">about us</a>'
            '</body></html>',
            '<html><body><a href="http://t.example.com/x.html">'
            'great   article</a></body></html>',
        ]})
    want = {
        ("http://t.example.com/x.html", "great article"): 3,
        ("http://t.example.com/x.html", "must read"): 1,
        ("http://a.example.com/about", "about us"): 2,
    }
    for parts in (1, 3):
        ds = rd.from_pandas(pages).repartition(parts)
        out = anchor_text_rollup(ds).to_pandas()
        got = {(r["dst_url"], r["anchor_text"]): int(r["n_refs"])
               for _, r in out.iterrows()}
        assert got == want, (parts, got)


def test_near_search_exact(ray_session):
    """NEAR/w pair counts == brute-force truth on hand-built docs:
    window boundary inclusive, multiplicities multiply (2 a's × 2 b's
    in range = 4 pairs), digit tokens dropped from the position stream,
    docs missing either term absent, layout-invariant."""
    import itertools

    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_positional_index,
        near_search,
        phrase_tokens,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gap gap gap gap beta alpha",   # mixed spacing
            "alpha 42 7 beta",        # digits dropped -> distance 1
            "alpha gap gap gap gap gap beta",          # distance 6 > w
            "beta beta only here",                     # no alpha
        ]})

    def brute(txt, w):
        ws = phrase_tokens(txt)
        ai = [i for i, x in enumerate(ws) if x == "alpha"]
        bi = [i for i, x in enumerate(ws) if x == "beta"]
        return sum(1 for p, q in itertools.product(ai, bi)
                   if abs(p - q) <= w)

    for w in (1, 5):
        want = {int(r["doc_id"]): brute(r["text"], w)
                for _, r in docs.iterrows()
                if brute(r["text"], w) > 0}
        for parts in (1, 3):
            pos = build_positional_index(
                rd.from_pandas(docs).repartition(parts),
                n_parts=4).materialize()
            out = near_search(pos, "alpha", "beta", window=w,
                              n_parts=4).to_pandas()
            got = {int(r["doc_id"]): int(r["n_pairs"])
                   for _, r in out.iterrows()}
            assert got == want, (w, parts, got, want)
    with pytest.raises(ValueError):
        near_search(pos, "alpha", "alpha", window=2)


def test_core_decomposition_exact(ray_session):
    """Distributed peel == known coreness on a hand graph: K4 clique
    (coreness 3) with a path tail (coreness 1) and a pendant off the
    clique (coreness 1); layout-invariant; empty graph returns empty."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import core_decomposition

    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
           (3, 4), (4, 5),                                   # path tail
           (0, 6)]                                           # pendant
    edges = pd.DataFrame({
        "src": [a for a, b in und] + [b for a, b in und],
        "dst": [b for a, b in und] + [a for a, b in und]})
    want = {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1}
    for parts in (1, 4):
        out = core_decomposition(
            rd.from_pandas(edges).repartition(parts))
        got = dict(zip(out["node_id"].astype(int),
                       out["coreness"].astype(int)))
        assert got == want, (parts, got)

    empty = rd.from_pandas(pd.DataFrame(
        {"src": pd.Series(dtype="int64"),
         "dst": pd.Series(dtype="int64")}))
    assert len(core_decomposition(empty)) == 0


def test_core_decomposition_distributed_parity(ray_session):
    """node_broadcast_limit=0 forces the Dataset-resident peel (alive
    set / degrees / edge shrink all as Datasets, nothing node-scaled on
    the driver) — it must reproduce the broadcast path exactly on the
    hand graph, on BOTH edge-shrink paths (broadcast_limit_bytes=0
    forces the anti-join fallback)."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import core_decomposition

    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
           (3, 4), (4, 5), (0, 6)]
    edges = rd.from_pandas(pd.DataFrame({
        "src": [a for a, b in und] + [b for a, b in und],
        "dst": [b for a, b in und] + [a for a, b in und]}))
    want = {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1}
    for blim in (256 << 20, 0):
        out = core_decomposition(edges, node_broadcast_limit=0,
                                 broadcast_limit_bytes=blim, n_parts=2)
        got = dict(zip(out["node_id"].astype(int),
                       out["coreness"].astype(int)))
        assert got == want, (blim, got)


def test_remove_dup_substrings_paths(ray_session):
    """ExactSubstr removal: hand-computed truth (merged overlapping
    gram islands excised, unchanged docs absent) AND broadcast-path ==
    wide-path (broadcast_limit_bytes=0 forces the two-sided doc-keyed
    exchange) on the same input."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import (
        remove_dup_substrings)

    dup = "X" * 12                     # shared 12-char run
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"aaa{dup}bbb", f"ccc{dup}ddd", "unique text here"]})
    # gram_len=8: dup grams are the 8-grams fully inside the X-run of
    # each doc (positions 3..7 in doc 1/2) -> island [3, 7+8) = [3,15)
    want = {1: ("aaabbb", 12), 2: ("cccddd", 12)}

    for limit in (256 << 20, 0):
        out = remove_dup_substrings(
            rd.from_pandas(docs).repartition(2), gram_len=8,
            broadcast_limit_bytes=limit).to_pandas()
        got = {int(r["doc_id"]): (r["clean_text"],
                                  int(r["removed_chars"]))
               for _, r in out.iterrows()}
        assert got == want, (limit, got)


def test_dup_spans_wide_bloom_layer(ray_session):
    """The wide-path BLOOM layer: a budget sized between the bloom
    (1.5 B/key) and the raw set (8 B/key) forces the wide path WITH
    the bloom pre-filter. All three layers (broadcast / wide+bloom /
    wide-unfiltered) must agree on spans AND removal, and the bloom
    layer's exchange volume must be duplicate-scaled: candidate_rows
    ≪ total gram positions on a mostly-unique corpus (the sub-linear
    pin the position-scaled legacy form can't meet)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import (
        dup_substring_spans, remove_dup_substrings)

    rng = np.random.default_rng(3)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz "))
    dup_run = "the same exact duplicated sentence appears here twice"
    texts = []
    for i in range(60):
        body = "".join(rng.choice(letters, size=400))
        # plant the dup run in a third of the docs
        texts.append(body[:200] + dup_run + body[200:] if i % 3 == 0
                     else body)
    docs = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})
    ds = rd.from_pandas(docs).repartition(3)
    total_positions = sum(len(t) - 8 + 1 for t in texts)

    truth_spans = dup_substring_spans(ds, gram_len=8).to_pandas()
    stats = {}
    # budget 4 B/key: raw 8 B/key overflows, the 1.5 B/key bloom fits
    pre = {}
    dup_substring_spans(ds, gram_len=8, stats=pre)   # learn n_dup
    budget = 4 * pre["n_dup_hashes"]
    got = dup_substring_spans(ds, gram_len=8,
                              broadcast_limit_bytes=budget,
                              stats=stats).to_pandas()
    assert stats["path"] == "wide" and stats["bloom_bytes"] > 0
    assert got.equals(truth_spans)
    # duplicate-scaled exchange: candidates ≪ corpus positions
    assert stats["candidate_rows"] < 0.2 * total_positions, stats

    truth_rm = remove_dup_substrings(ds, gram_len=8).to_pandas()
    got_rm = remove_dup_substrings(
        ds, gram_len=8, broadcast_limit_bytes=budget).to_pandas()
    assert got_rm.equals(truth_rm)


def test_funnel_counts_exact(ray_session):
    """Funnel semantics on hand events: strict-after ordering (click
    BEFORE first view doesn't count), first-touch timestamps, users
    missing a stage absent downstream, layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import funnel_counts

    T = pd.Timestamp
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3, 4],
        "ts": [T("2024-01-01 10:00"), T("2024-01-01 10:05"),
               T("2024-01-01 10:10"),                       # u1: v,c,p
               T("2024-01-01 09:00"), T("2024-01-01 08:00"),  # u2: v; c BEFORE v
               T("2024-01-01 07:00"), T("2024-01-01 07:30"),
               T("2024-01-01 07:10"),                       # u3: v,c; p between v and c
               T("2024-01-01 06:00")],                      # u4: purchase only
        "event_type": ["view", "click", "purchase",
                       "view", "click",
                       "view", "click", "purchase",
                       "purchase"]})
    for parts in (1, 3):
        out = funnel_counts(rd.from_pandas(ev).repartition(parts),
                            ["view", "click", "purchase"])
        got = dict(zip(out["step"], out["n_users"].astype(int)))
        assert got == {"step1_view": 3, "step2_click": 2,
                       "step3_purchase": 1}, (parts, got)


def test_repetition_signals_exact(ray_session):
    """Hand-checked Gopher repetition metrics: 'a b a b a b' has
    top2 = count('a b')=3 ·2/6 = 1.0 (overlap-unaware by definition),
    dup-gram coverage is a position UNION (no double count), short docs
    yield 0.0, digits drop from the stream."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.textstats import (
        doc_repetition_signals)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a b a b",
                 "one two three four five one two three four five six",
                 "tiny 42 doc"]})
    out = doc_repetition_signals(
        rd.from_pandas(docs).repartition(2)).to_pandas() \
        .set_index("doc_id")
    # doc 1: 6 tokens; top2: 'a b' x3 -> 3*2/6=1.0; top3: 'a b a' x2 ->
    # 2*3/6=1.0; dup5: all five 5-grams dup? grams: (a b a b a) x1,
    # (b a b a b) x1 -> no dup5 -> 0.0
    r1 = out.loc[1]
    assert r1["top2_frac"] == 1.0 and r1["top3_frac"] == 1.0
    assert r1["dup5_frac"] == 0.0
    # doc 2: 11 tokens; 'one two three four five' repeats at pos 0 and 5
    # -> dup5 covers positions 0..9 = 10/11
    r2 = out.loc[2]
    assert abs(r2["dup5_frac"] - round(10 / 11, 6)) < 1e-9
    assert r2["top2_frac"] == round(2 * 2 / 11, 6)
    # doc 3: tokens ['tiny','doc'] (digit dropped): top2 = 1*2/2 = 1.0,
    # all n>2 metrics 0.0
    r3 = out.loc[3]
    assert r3["top2_frac"] == 1.0 and r3["top4_frac"] == 0.0
    assert r3["dup8_frac"] == 0.0


def _brute_winnow(toks, n, w):
    """Independent O(G·w) reference: enumerate every window, pick the
    rightmost minimum by explicit scan."""
    import hashlib

    G = len(toks) - n + 1
    if G <= 0:
        return set()
    h = [int(hashlib.md5(" ".join(toks[i:i + n]).encode())
             .hexdigest()[:15], 16) for i in range(G)]
    sel = set()
    starts = range(G - w + 1) if G >= w else [0]
    for s in starts:
        window = h[s:s + w]
        m = min(window)
        # rightmost index attaining the min
        p = s + max(j for j, v in enumerate(window) if v == m)
        sel.add((p, h[p]))
    return sel


def test_winnow_fingerprints_reference(ray_session):
    """Engine winnowing == brute-force window enumeration on docs that
    cover all regimes: G < w, G == w, G > w with in-window ties
    (repeated grams), empty-token docs; layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.fingerprint import (
        winnow_fingerprints)
    from stimson_web_scraper_ray.pipelines.index import phrase_tokens

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["alpha beta gamma delta",                      # G=2 < w
                 "a b c d e f g h i j",                         # G=8 == w
                 "x y z x y z x y z x y z w q r s t u v",       # ties
                 "1 2 3 44",                                    # all digits
                 " ".join(f"tok{i % 7}" for i in range(40))]})  # G>w, ties
    for parts in (1, 3):
        out = winnow_fingerprints(
            rd.from_pandas(docs).repartition(parts), n=3, w=8) \
            .to_pandas()
        got = {did: set(zip(g["pos"], g["fp"]))
               for did, g in out.groupby("doc_id")}
        for _, row in docs.iterrows():
            want = _brute_winnow(phrase_tokens(row["text"]), 3, 8)
            assert got.get(row["doc_id"], set()) == want, \
                (parts, row["doc_id"])


def test_winnow_guarantee_and_overlap(ray_session):
    """The winnowing guarantee: two docs sharing a run of >= n+w-1
    tokens share at least one fingerprint; overlap pairs honor the
    min_shared floor and come back sorted."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.fingerprint import (
        winnow_overlap_pairs)

    shared = " ".join(f"common{i}" for i in range(30))  # 30 >> n+w-1=10
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [f"unique one two {shared} tail stuff here",
                 f"totally different head {shared} and an end",
                 "nothing in common with anything else at all"]})
    out = winnow_overlap_pairs(rd.from_pandas(docs).repartition(2),
                               n=3, w=8, min_shared=1).to_pandas()
    pairs = set(zip(out["a"], out["b"]))
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)
    # a high floor drops the pair
    hi = winnow_overlap_pairs(rd.from_pandas(docs), n=3, w=8,
                              min_shared=10_000).to_pandas()
    assert hi.empty


def test_search_any_phrase(ray_session):
    """Disjunctive positional search: per-phrase per-doc counts match
    hand counts (overlaps counted, repeated-term phrase exact, absent
    phrase yields no rows), single exchange for the whole disjunction."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_positional_index, search_any_phrase)

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["big data big data big data",
                 "data data data and nothing else",
                 "totally unrelated words here"]})
    pos = build_positional_index(rd.from_pandas(docs).repartition(2)) \
        .materialize()
    out = search_any_phrase(
        pos, [["big", "data"], ["data", "data"], ["no", "hit"]]) \
        .to_pandas()
    got = {(int(r["doc_id"]), r["phrase"]): int(r["n_hits"])
           for _, r in out.iterrows()}
    # doc1 'big data' starts at 0,2,4; doc2 'data data' overlapping
    # starts at 0,1; 'no hit' absent everywhere; doc3 matches nothing
    assert got == {(1, "big data"): 3, (2, "data data"): 2}


def test_hll_sharded_matches_whole(ray_session):
    """The sharded-by-prefix HLL is a pure register partition: for any
    shard_bits it reproduces the whole-array estimator (±1 rounding),
    including the linear-counting small-range regime where most shards
    are empty (the missing-shard arithmetic fold)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sketch import (
        hll_distinct_per_group, hll_distinct_sharded)

    rng = np.random.RandomState(7)
    big = pd.DataFrame({
        "g": np.repeat(["a", "b"], 5000),
        "v": np.concatenate([rng.randint(0, 3000, 5000),
                             rng.randint(0, 40, 5000)])})
    tiny = pd.DataFrame({"g": ["c"] * 6, "v": np.arange(6)})
    ds = rd.from_pandas(pd.concat([big, tiny], ignore_index=True)) \
        .repartition(4)
    for p, sb in ((12, 3), (12, 5), (16, 3)):
        whole = hll_distinct_per_group(ds, "g", "v", p=p) \
            .set_index("g")["approx_distinct"]
        sh = hll_distinct_sharded(ds, "g", "v", p=p, shard_bits=sb) \
            .set_index("g")["approx_distinct"]
        assert set(sh.index) == {"a", "b", "c"}
        for g in ("a", "b", "c"):
            assert abs(int(sh[g]) - int(whole[g])) <= 1, (p, sb, g)
        # sanity: the small set is exact under linear counting
        assert int(sh["c"]) == 6, (p, sb)


def test_bfs_hops_hand_graph(ray_session):
    """BFS on a hand graph: a path 1->2->3->4->5, a shortcut 1->4, an
    unreachable island 10->11; multi-source min-dist; max_hops cut."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import bfs_hops

    edges = pd.DataFrame({
        "src": [1, 2, 3, 4, 1, 10],
        "dst": [2, 3, 4, 5, 4, 11]})
    ds = rd.from_pandas(edges).repartition(2)
    out = bfs_hops(ds, [1], max_hops=4)
    got = dict(zip(out["node_id"].astype(int), out["dist"].astype(int)))
    assert got == {1: 0, 2: 1, 3: 2, 4: 1, 5: 2}
    # hop cap: only 1 hop out
    out1 = bfs_hops(ds, [1], max_hops=1)
    got1 = dict(zip(out1["node_id"].astype(int),
                    out1["dist"].astype(int)))
    assert got1 == {1: 0, 2: 1, 4: 1}
    # multi-source: island seed joins in; min over sources
    out2 = bfs_hops(ds, [3, 10], max_hops=2)
    got2 = dict(zip(out2["node_id"].astype(int),
                    out2["dist"].astype(int)))
    assert got2 == {3: 0, 10: 0, 4: 1, 11: 1, 5: 2}


def test_pca_matches_numpy(ray_session):
    """Distributed-covariance PCA == numpy full PCA on the gathered
    table: eigenvalues match, components match up to the canonical
    sign, projections match, eigenvalue sum == trace, components
    orthonormal. Layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.similarity import (
        embedding_covariance, pca_fit, pca_project)

    rng = np.random.RandomState(11)
    # anisotropic data so the spectrum is distinct and signs are stable
    base = rng.randn(400, 6) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    rot, _ = np.linalg.qr(rng.randn(6, 6))
    X = base @ rot.T
    df = pd.DataFrame({"vec_id": np.arange(400, dtype=np.int64),
                       "embedding": [row.astype(np.float32)
                                     for row in X]})
    for parts in (1, 5):
        ds = rd.from_pandas(df).repartition(parts)
        cov = embedding_covariance(ds)
        Xf = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ref_cov = np.cov(Xf, rowvar=False, bias=True)
        assert np.allclose(cov, ref_cov, atol=1e-9), parts

        vals, comps = pca_fit(ds, k=3)
        ref_vals, ref_vecs = np.linalg.eigh(ref_cov)
        ref_order = np.argsort(ref_vals)[::-1][:3]
        assert np.allclose(vals, ref_vals[ref_order], rtol=1e-8)
        assert np.allclose(np.sum(np.linalg.eigh(cov)[0]),
                           np.trace(cov))
        assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
        for q in range(3):
            ref = ref_vecs[:, ref_order[q]]
            ref = ref * np.sign(ref[np.abs(ref).argmax()])
            assert np.allclose(comps[q], ref, atol=1e-8), (parts, q)

        proj = pca_project(ds, comps).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        want = np.round(Xf @ comps.T, 4)
        got = proj[["pc0", "pc1", "pc2"]].to_numpy()
        assert np.allclose(got, want, atol=1e-9), parts


def test_snapshot_diff_string_keys_and_block_layout(ray_session):
    """snapshot_diff over string keys (URLs), exact statuses, invariant
    to block layout."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.snapshot import snapshot_diff

    old = pd.DataFrame({
        "url": ["a", "b", "c", "d"],
        "fp": ["1", "2", "3", "4"]})
    new = pd.DataFrame({
        "url": ["b", "c", "e"],
        "fp": ["2", "XX", "9"]})
    want = {"a": "removed", "b": "unchanged", "c": "changed",
            "d": "removed", "e": "added"}
    for parts in (1, 3):
        got = snapshot_diff(rd.from_pandas(old).repartition(parts),
                            rd.from_pandas(new).repartition(parts),
                            "url", "fp", n_parts=4).to_pandas()
        assert dict(zip(got["url"], got["status"])) == want, parts
        assert len(got) == 5, parts


def test_cms_never_underestimates_property(ray_session):
    """CMS theorem 1 on adversarial random text: every probed word's
    estimate >= its exact count, at two block layouts (merge
    linearity)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.lm import ascii_words
    from stimson_web_scraper_ray.pipelines.sketch import (
        cms_build, cms_estimate)

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(500)]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(5, 60)))
            for _ in range(300)]
    df = pd.DataFrame({"text": docs})
    exact: dict[str, int] = {}
    for t in docs:
        for w in ascii_words(t):
            exact[w] = exact.get(w, 0) + 1

    M1, n1 = cms_build(rd.from_pandas(df).repartition(1), d=4, w=512)
    M5, n5 = cms_build(rd.from_pandas(df).repartition(5), d=4, w=512)
    assert np.array_equal(M1, M5)          # linear merge ≡ single pass
    assert n1 == n5 == sum(exact.values())
    words = sorted(exact)
    est = cms_estimate(M1, words)
    ex = np.array([exact[w] for w in words])
    assert (est >= ex).all()
    # total mass conservation per row
    assert (M1.sum(axis=1) == n1).all()


def test_rollup_aggregate_levels(ray_session):
    """ROLLUP levels vs a hand reduction, block-layout invariant."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import (
        rollup_aggregate)

    df = pd.DataFrame({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    for parts in (1, 4):
        ds = rd.from_pandas(df).repartition(parts)
        out = rollup_aggregate(ds, ["a", "b"], {"sv": "v"}).to_pandas()
        leaf = out[out["b"].notna()]
        assert len(leaf) == 4
        assert leaf.set_index(["a", "b"])["sv"].to_dict() == {
            ("x", "p"): 1.0, ("x", "q"): 2.0,
            ("y", "p"): 7.0, ("y", "q"): 5.0}
        mid = out[out["b"].isna() & out["a"].notna()]
        assert mid.set_index("a")["sv"].to_dict() == {"x": 3.0, "y": 12.0}
        assert mid.set_index("a")["n_rows"].to_dict() == {"x": 2, "y": 3}
        tot = out[out["a"].isna()]
        assert len(tot) == 1
        assert float(tot["sv"].iloc[0]) == 15.0
        assert int(tot["n_rows"].iloc[0]) == 5


def test_bigram_scorer_order_sensitivity(ray_session):
    """The conditional bigram NLL moves when word order is scrambled;
    the unigram NLL can't (same bag of words)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.lm import bigram_nll

    natural = "the cat sat on the mat " * 10
    scrambled = "mat the on sat cat the " * 10
    df = pd.DataFrame({"doc_id": [1, 2], "text": [natural, scrambled]})
    out = bigram_nll(rd.from_pandas(df), top_b=50, top_u=20) \
        .to_pandas().set_index("doc_id")
    assert out.loc[1, "n_bigrams"] == out.loc[2, "n_bigrams"]
    assert out.loc[1, "avg_nll2"] != out.loc[2, "avg_nll2"]


def test_prefix_jaccard_matches_index_and_prunes(ray_session, sf_dir):
    """AllPairs/PPJoin prefix filter ≡ the full inverted index on the
    same corpus, and its candidate volume is a small fraction of the
    all-pairs space (the point of the prefix)."""
    from stimson_web_scraper_ray.pipelines.dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    n_docs = ds.count()
    stats = {}
    a = prefix_jaccard_pairs(ds, stats=stats).to_pandas() \
        .reset_index(drop=True)
    b = ngram_jaccard_pairs(ds).to_pandas().reset_index(drop=True)
    assert a.equals(b)
    assert len(a) > 0
    # prune evidence: candidates ≪ all-pairs (measured ~882 of 124,750
    # at sf0.001) and every true pair survived candidacy
    assert stats["n_candidates"] < 0.05 * n_docs * (n_docs - 1) / 2
    assert stats["n_candidates"] >= len(a)


def test_pq_roundtrip_and_recall(ray_session, sf_dir):
    """PQ codes reconstruct better than the global-mean baseline, ADC
    self-distance ranks the encoded vector itself first for most
    queries, and recall@10 vs the exact L2 scan clears the gate floor."""
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.similarity import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vecs = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    books = pq_train(ds)
    m, kk, sub = books.shape
    codes_df = pq_encode(ds, books).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    codes = np.array(codes_df["codes"].tolist(), dtype=np.int64)
    order = np.argsort(ids)
    recon = np.concatenate(
        [books[b][codes[:, b]] for b in range(m)], axis=1)
    v_sorted = vecs[order]
    pq_err = ((v_sorted - recon) ** 2).sum()
    mean_err = ((v_sorted - v_sorted.mean(axis=0)) ** 2).sum()
    assert pq_err < 0.7 * mean_err
    qvec = vecs[ids < 8]
    out = pq_adc_topk(pq_encode(ds, books), books, qvec, k=10)
    hits = 0
    for qi in range(8):
        d = ((vecs - qvec[qi]) ** 2).sum(axis=1)
        truth = set(ids[np.lexsort((ids, d))[:10]].tolist())
        sub_df = out[out["query_id"] == qi].sort_values("rank")
        got = set(sub_df["vec_id"].tolist())
        assert len(truth & got) / 10 >= 0.5, qi
        hits += int(sub_df["vec_id"].iloc[0] == qi)
    assert hits >= 6          # self-match first for nearly all queries


def test_scc_known_graph(ray_session):
    """Hand-built graph with known SCC structure: two 3-cycles bridged
    one-way, plus a chain tail — the trim, color, and backward passes
    all exercise."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import (
        strongly_connected_components,
    )

    # cycle A: 1→2→3→1; cycle B: 10→11→12→10; bridge 3→10 (one-way);
    # tail 12→20→21 (chain, all singletons)
    src = [1, 2, 3, 10, 11, 12, 3, 12, 20]
    dst = [2, 3, 1, 11, 12, 10, 10, 20, 21]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    out = strongly_connected_components(edges).set_index("node_id")[
        "scc_id"].to_dict()
    assert out[1] == out[2] == out[3] == 3
    assert out[10] == out[11] == out[12] == 12
    assert out[20] == 20 and out[21] == 21
    assert out[3] != out[12]                 # one-way bridge ≠ merge


def test_scc_distributed_path_matches_broadcast(ray_session):
    """node_broadcast_limit=0 forces the Dataset-resident SCC path
    (active/color/mark state as Datasets, hash_join + salted exchanges
    per wave, nothing node-scaled on the driver) — it must reproduce
    the broadcast path exactly on the known graph (both cycles, the
    one-way bridge, and the trim tail all exercised)."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import (
        strongly_connected_components,
    )

    src = [1, 2, 3, 10, 11, 12, 3, 12, 20]
    dst = [2, 3, 1, 11, 12, 10, 10, 20, 21]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    a = strongly_connected_components(edges)
    b = strongly_connected_components(edges, node_broadcast_limit=0,
                                      n_parts=2)
    assert a.equals(b)
    # broadcast_limit_bytes=0 forces the anti-join edge-shrink layer
    # (the k-core twin pins it too — review finding: it had no coverage)
    c = strongly_connected_components(edges, node_broadcast_limit=0,
                                      broadcast_limit_bytes=0,
                                      n_parts=2)
    assert a.equals(c)


def test_pagerank_weighted_parity_and_paths(ray_session):
    """weight_col semantics: all-ones weights reproduce the unweighted
    algebra to 1e-12 on BOTH execution paths (the bincount-of-ones
    contract), the forced-distributed path matches broadcast, and a
    2x-weighted edge shifts rank toward its target on a hand graph."""
    import numpy as np
    import pandas as pd

    from stimson_web_scraper_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(5)
    s = rng.integers(0, 30, 120)
    d = rng.integers(0, 40, 120)
    mm = s != d
    e0 = pd.DataFrame({"src": s[mm].astype(np.int64),
                       "dst": d[mm].astype(np.int64)})
    e1 = e0.assign(wt=np.ones(len(e0), np.int64))
    a = pagerank(rd.from_pandas(e0), iters=3)
    b = pagerank(rd.from_pandas(e1), iters=3, weight_col="wt")
    c = pagerank(rd.from_pandas(e1), iters=3, weight_col="wt",
                 node_broadcast_limit=0)
    assert np.allclose(a["score"], b["score"], atol=1e-12)
    assert np.allclose(b["score"], c["score"], atol=1e-9)

    # star 0 -> {1, 2}, edge to 2 twice the weight: node 2 out-ranks 1
    hand = pd.DataFrame({"src": [0, 0], "dst": [1, 2],
                         "wt": np.array([1, 2], np.int64)})
    h = pagerank(rd.from_pandas(hand), iters=3, weight_col="wt") \
        .set_index("node_id")["score"]
    assert h[2] > h[1]

    import pytest
    with pytest.raises(ValueError, match="collides"):
        pagerank(rd.from_pandas(e1.rename(columns={"wt": "w"})),
                 weight_col="w")


def test_hyperball_path_graph(ray_session):
    """HyperBall N(t) on the directed path 0→1→2→3: exact values are
    7, 9, 10 (balls of radius 1..3, self included); at these
    cardinalities the HLL linear-counting regime makes p=12 estimates
    near-exact (within 2%). The packed-bitmap exact recount must be
    spot-on; layout-invariant."""
    import pandas as pd
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import (
        _exact_neighborhood_pairs,
        hyperball,
    )

    e = rd.from_arrow(pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                                "dst": pa.array([1, 2, 3], pa.int64())}))
    want = [7, 9, 10]
    assert _exact_neighborhood_pairs(
        pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]}), 3) == want
    for n_blocks in (1, 3):
        out = hyperball(e.repartition(n_blocks), max_t=3, p=12)
        assert out["t"].tolist() == [1, 2, 3]
        for est, w in zip(out["pairs_est"], want):
            assert abs(est - w) / w < 0.02, (est, w)


def test_link_prediction_square_with_diagonal(ray_session):
    """Adamic–Adar on the square 0-1-2-3 with diagonal 0-2: the ONLY
    prediction is (1,3) — common neighbors {0,2}, aa = 2/ln 3 — and
    the adjacent pair (0,2) is excluded even though it also shares two
    neighbors (the exact marker-row adjacency exclusion).
    Layout-invariant."""
    import numpy as np
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import (
        link_prediction_scores,
    )

    und = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    e = rd.from_arrow(pa.table({
        "src": pa.array([a for a, b in und] + [b for a, b in und],
                        pa.int64()),
        "dst": pa.array([b for a, b in und] + [a for a, b in und],
                        pa.int64())}))
    for n_blocks in (1, 4):
        out = link_prediction_scores(e.repartition(n_blocks), k=10,
                                     n_parts=2)
        assert len(out) == 1
        assert (int(out["a"][0]), int(out["b"][0])) == (1, 3)
        assert int(out["common_neighbors"][0]) == 2
        assert abs(out["adamic_adar"][0]
                   - round(2 / np.log(3), 4)) < 1e-9


def test_label_propagation_heals_bridges(ray_session):
    """LPA on two 5-cliques joined by one bridge edge 4–9: connected
    components would flood everything into one cluster; deterministic
    plurality-vote LPA must keep the cliques separate (the bridge
    endpoint's leaked vote loses to 4 intra-clique votes) and converge
    each clique to its min node id. Layout-invariant across block
    splits."""
    import itertools

    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.graph import label_propagation

    pairs = (list(itertools.combinations(range(5), 2))
             + list(itertools.combinations(range(5, 10), 2))
             + [(4, 9)])
    src = [a for a, b in pairs] + [b for a, b in pairs]
    dst = [b for a, b in pairs] + [a for a, b in pairs]
    edges = rd.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))
    # limit 500k = broadcast fast path; limit 0 = forced exchange path
    # (the pagerank-style two-path parity pin)
    for n_blocks in (1, 4):
        for limit in (500_000, 0):
            lab = label_propagation(edges.repartition(n_blocks),
                                    iters=3, n_parts=4,
                                    node_broadcast_limit=limit) \
                .to_pandas()
            got = dict(zip(lab["node"].astype(int),
                           lab["label"].astype(int)))
            assert got == {**{i: 0 for i in range(5)},
                           **{i: 5 for i in range(5, 10)}}, \
                (n_blocks, limit)


def test_merge_inverted_index_exact_and_incremental(ray_session, sf_dir):
    """Merged index ≡ fresh full-corpus index (with and without
    tombstones), and a delta touching few terms leaves the other
    partitions as straight file copies (the incremental-cost claim)."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        merge_inverted_index,
        write_inverted_index,
    )

    full = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def split(mod_eq):
        def fn(t):
            m = (t["doc_id"].to_numpy() % 3 == 0) == mod_eq
            return t.filter(pa.array(m))
        return fn

    def read_idx(d):
        frames = [pq.read_table(f, columns=["term", "df", "postings"])
                  .to_pandas()
                  for f in glob.glob(os.path.join(d, "part=*",
                                                  "*.parquet"))]
        t = pd.concat(frames, ignore_index=True)
        t["postings"] = t["postings"].map(
            lambda p: ",".join(str(int(x)) for x in p))
        return t.sort_values("term").reset_index(drop=True)

    dirs = {n: f"/tmp/swsr_mi_test_{n}" for n in
            ("base", "out", "full", "rm", "tiny")}
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    write_inverted_index(build_inverted_index(
        full.map_batches(split(False), batch_format="pyarrow")),
        dirs["base"])
    delta = full.map_batches(split(True), batch_format="pyarrow")
    merge_inverted_index(dirs["base"], delta, dirs["out"])
    write_inverted_index(build_inverted_index(full), dirs["full"])
    assert read_idx(dirs["out"]).equals(read_idx(dirs["full"]))

    # tombstones purge the BASE only (delete-then-add contract: a doc
    # in BOTH removed_doc_ids and the delta is a re-fetch and its
    # delta postings survive) — expected corpus = delta ∪ (base \ rm)
    rm = full.to_pandas()
    rm_ids = rm.loc[rm["doc_id"] % 7 == 0, "doc_id"].tolist()
    merge_inverted_index(dirs["base"], delta, dirs["rm"],
                         removed_doc_ids=rm_ids)
    shutil.rmtree(dirs["full"], ignore_errors=True)
    keep = rm[(rm["doc_id"] % 3 == 0)
              | (rm["doc_id"] % 7 != 0)].reset_index(drop=True)
    write_inverted_index(build_inverted_index(rd.from_pandas(keep)),
                         dirs["full"])
    assert read_idx(dirs["rm"]).equals(read_idx(dirs["full"]))

    # incremental cost: a one-term delta touches ~1 partition; the rest
    # of the base partitions are copied, not read
    tiny = rd.from_arrow(pa.table({
        "doc_id": pa.array([999_999], pa.int64()),
        "text": pa.array(["zzzuniqueterm"], pa.string())}))
    stats = {}
    merge_inverted_index(dirs["base"], tiny, dirs["tiny"], stats=stats)
    assert stats["touched_parts"] == 1
    assert stats["copied_parts"] >= 1


def test_skew_join_parity_and_routing(ray_session):
    """skew_join ≡ hash_join under forced 50%-one-key skew (inner and
    left), the hot rows actually route around the exchange, and the
    hot_bytes_limit=0 fallback still matches."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import hash_join, skew_join

    rng = np.random.default_rng(7)
    n = 20000
    keys = np.where(rng.random(n) < 0.5, 42,
                    rng.integers(0, 1000, n)).astype("int64")
    left = rd.from_arrow(pa.table(
        {"k": keys, "v": np.arange(n, dtype="int64")}))
    right = rd.from_arrow(pa.table(
        {"k": np.arange(0, 1000, 2, dtype="int64"),
         "w": np.arange(500, dtype="int64") * 10}))
    for how in ("inner", "left"):
        stats = {}
        a = skew_join(left, right, "k", how=how, hot_frac=0.05,
                      stats=stats).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        b = hash_join(left, right, "k", how=how).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        assert a.equals(b), how
        assert stats["hot_keys"] == 1
        assert stats["hot_left_rows"] > 0.4 * n
    fb = skew_join(left, right, "k", hot_frac=0.05,
                   hot_bytes_limit=0).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    assert fb.equals(hash_join(left, right, "k").to_pandas()
                     .sort_values(["k", "v"]).reset_index(drop=True))


def test_skew_join_string_keys(ray_session):
    """String keys fold for routing but merge on real values — a fold
    collision can only co-route, never mis-join."""
    import pyarrow as pa

    from stimson_web_scraper_ray.pipelines.join import hash_join, skew_join

    rng = np.random.default_rng(11)
    n = 5000
    keys = np.where(rng.random(n) < 0.5, -1, rng.integers(0, 200, n))
    left = rd.from_arrow(pa.table(
        {"k": np.where(keys == -1, "hot", keys.astype(str)),
         "v": np.arange(n, dtype="int64")}))
    right = rd.from_arrow(pa.table(
        {"k": np.append(np.arange(200).astype(str), "hot"),
         "w": np.arange(201, dtype="int64")}))
    stats = {}
    a = skew_join(left, right, "k", hot_frac=0.05, stats=stats) \
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    b = hash_join(left, right, "k").to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    assert a.equals(b)
    assert stats["hot_keys"] == 1


def test_sorted_neighborhood_partition_invariance(ray_session, sf_dir):
    """The boundary-halo straddle pass is exact: a 1-part run (no
    straddles possible) and a 64-part run (parts of ~8 rows, straddles
    everywhere) return identical pair sets."""
    from stimson_web_scraper_ray.pipelines.dedup import (
        sorted_neighborhood_pairs,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    one = sorted_neighborhood_pairs(ds, window=5, n_parts=1).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    many = sorted_neighborhood_pairs(ds, window=5, n_parts=64).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    assert one.equals(many)
    n = ds.count()
    assert len(one) == 5 * n - 15      # n·w − w(w+1)/2 pairs exactly


def test_cohort_retention_properties(ray_session, sf_dir):
    """Offset-0 row of each cohort counts every cohort member (first
    events land at offset 0) and dominates later offsets; offset-0
    totals sum to the distinct user count."""
    from stimson_web_scraper_ray.pipelines.analytics import cohort_retention

    df = cohort_retention(sf_dir)
    import pyarrow.parquet as pq

    users = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    n_users = len(np.unique(users["user_id"].to_numpy()))
    day0 = df[df["day_offset"] == 0]
    assert int(day0["n_users"].sum()) == n_users
    m = df.merge(day0[["cohort_day", "n_users"]], on="cohort_day",
                 suffixes=("", "_c0"))
    assert (m["n_users"] <= m["n_users_c0"]).all()


def test_ppr_paths_and_mass(ray_session, sf_dir):
    """Personalized PageRank: broadcast ≡ forced-distributed path, and
    total mass stays 1 (teleport + dangling both land on the seeds)."""
    from stimson_web_scraper_ray.pipelines.graph import trade_ppr

    a = trade_ppr(sf_dir)
    b = trade_ppr(sf_dir, node_broadcast_limit=1) \
        .sort_values("node_id").reset_index(drop=True)
    assert a.equals(b)
    assert abs(a["score"].sum() - 1.0) < 1e-4
    # seeds (two smallest customer = even ids) dominate their own scores
    seeds = a[a["node_id"] % 2 == 0].nsmallest(2, "node_id")
    assert (seeds["score"] > a["score"].median()).all()


def test_ntile_by_group_matches_sql_semantics(ray_session):
    """ntile_by_group == the SQL tile algebra (first N%n tiles get one
    extra row under a UNIQUE (value, tie) order) on random data with
    heavy value ties, a single-row group, and n > group size, at
    several block layouts — the two-phase scan must be
    layout-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import ntile_by_group

    rng = np.random.default_rng(62)
    df = pd.DataFrame({
        "id": np.arange(700, dtype="int64"),
        "g": rng.choice(["a", "b", "c"], 700),
        "v": rng.integers(0, 20, 700).astype("int64"),  # heavy ties
    })
    df.loc[0, "g"] = "solo"  # single-row group, n=4 > size=1

    def sql_ntile(sub: pd.DataFrame, n: int) -> np.ndarray:
        sub = sub.sort_values(["v", "id"], kind="mergesort")
        N = len(sub)
        q, r = divmod(N, n)
        rn0 = np.arange(N)
        big = r * (q + 1)
        tile0 = np.where(rn0 < big, rn0 // max(q + 1, 1),
                         r + (rn0 - big) // max(q, 1))
        return pd.Series(tile0 + 1, index=sub["id"].to_numpy())

    want = pd.concat([sql_ntile(sub, 4)
                      for _, sub in df.groupby("g", sort=False)])
    for parts in (1, 5, 11):
        ds = rd.from_pandas(df).repartition(parts)
        got = ntile_by_group(ds, "g", "v", "id", 4).to_pandas() \
            .sort_values("id").reset_index(drop=True)
        got_map = pd.Series(got["tile"].to_numpy(),
                            index=got["id"].to_numpy())
        assert (got_map.sort_index() == want.sort_index()).all(), parts


def test_image_ahash_planted_dups_exact(ray_session):
    """The aHash near-dup pipeline recovers EVERY planted duplicate
    (brightness-shifted and 2x-upscaled copies hash identically — both
    transforms are aHash-invariant by construction) with zero
    cross-base false pairs, and the generic hamming core's pigeonhole
    sizing holds (d=7 with 8x8-bit chunks)."""
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.multimodal import (
        ahash64, decode_ppm, image_ahash_pairs, synth_media_with_dups)

    tbl = synth_media_with_dups(n_base=24, seed=13)
    # kernel invariants, checked directly on the payloads
    imgs = [decode_ppm(p.as_py()) for p in tbl["payload"]]
    for i in range(0, len(imgs), 3):
        assert ahash64(imgs[i]) == ahash64(imgs[i + 1])  # brightness
        assert ahash64(imgs[i]) == ahash64(imgs[i + 2])  # 2x upscale

    pred = image_ahash_pairs(rd.from_arrow(tbl), max_hamming=7,
                             fake=False).to_pandas()
    got = set(zip(pred["a"].astype(int), pred["b"].astype(int)))
    want = {(3 * i + a, 3 * i + b)
            for i in range(24) for a, b in ((0, 1), (0, 2), (1, 2))}
    assert got == want  # recall 1.0 AND precision 1.0
    assert (pred["hamming"] == 0).all()


def test_kll_sketch_bounds_and_exact_small(ray_session):
    """KLL: (1) exact quantiles while N <= k (no compaction yet);
    (2) <=2% rank error on a heavy-tailed 120k-row mix at every tested
    block layout (mergeability: each layout produces different partial
    sketches that must still fold within bound)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sketch import (
        KLLSketch, kll_quantiles)

    # (1) exact for small N
    small = np.arange(100, dtype=np.float64)
    sk = KLLSketch(k=200, seed=5)
    sk.update_many(small)
    assert sk.quantile(0.5) in small
    assert abs(sk.quantile(0.5) - 50.0) <= 1.0  # exact rank, no decay

    # (2) bound at several layouts
    rng = np.random.default_rng(9)
    data = np.concatenate([rng.lognormal(0.0, 1.5, 100_000),
                           rng.normal(100.0, 1.0, 20_000)])
    sd = np.sort(data)
    df = pd.DataFrame({"value": data})
    for parts in (1, 6, 17):
        ds = rd.from_pandas(df).repartition(parts)
        est, _ = kll_quantiles(ds, "value", [0.05, 0.5, 0.95], k=200)
        for q, v in est.items():
            rank = np.searchsorted(sd, v, side="right") / len(sd)
            assert abs(rank - q) <= 0.02, (parts, q, rank)


def test_watermark_scan_part_invariance(ray_session, sf_dir):
    """The distributed watermark scan's two-phase prefix max must be
    invariant in n_parts: n_parts=1 is the trivially-correct single
    scan (one range holds the whole stream), so equality across part
    counts pins the cross-part base handoff — including the case where
    an earlier part's max dominates an entire later range."""
    import pandas as pd

    from stimson_web_scraper_ray.pipelines.analytics import \
        watermark_late_events

    sf = sf_dir
    ref = watermark_late_events(sf, n_parts=1)
    assert ref["n_late"].sum() > 0 and ref["n_on_time"].sum() > 0
    for parts in (4, 13, 64):
        out = watermark_late_events(sf, n_parts=parts)
        pd.testing.assert_frame_equal(out, ref)


def test_kll_group_quantiles_bounds_and_layouts(ray_session):
    """Grouped KLL (sketch-per-group + one group-functional exchange):
    (1) exact per-group quantiles while every group's N <= k;
    (2) <=2% per-group rank error on groups with very different
    distributions AND sizes, at several block layouts (each layout
    yields different partials that must fold within bound);
    (3) n_est equals the exact group size (merge preserves weight)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sketch import \
        kll_group_quantiles

    # (1) exact while N <= k: two tiny groups of known medians
    small = pd.DataFrame({
        "g": ["a"] * 99 + ["b"] * 51,
        "v": list(range(99)) + list(range(0, 5100, 100))})
    ds = rd.from_pandas(small).repartition(4)
    out = kll_group_quantiles(ds, "g", "v", [0.5], k=200)
    est = dict(zip(out["g"], out["est"]))
    assert est["a"] == 49.0 and est["b"] == 2500.0
    assert dict(zip(out["g"], out["n_est"])) == {"a": 99, "b": 51}

    # (2)/(3) bound per group across layouts, skewed sizes + shapes
    rng = np.random.default_rng(11)
    frames = {
        "heavy": rng.lognormal(0.0, 1.5, 60_000),
        "normal": rng.normal(100.0, 1.0, 9_000),
        "uniform": rng.uniform(-5, 5, 700),
    }
    df = pd.concat([pd.DataFrame({"g": g, "v": v})
                    for g, v in frames.items()], ignore_index=True)
    sorted_by_g = {g: np.sort(v) for g, v in frames.items()}
    qs = [0.1, 0.5, 0.9]
    for parts in (1, 7, 23):
        ds = rd.from_pandas(df).repartition(parts)
        out = kll_group_quantiles(ds, "g", "v", qs, k=200)
        assert len(out) == len(frames) * len(qs)
        for _, r in out.iterrows():
            sd = sorted_by_g[r["g"]]
            assert int(r["n_est"]) == len(sd), (parts, r["g"])
            rank = np.searchsorted(sd, r["est"], side="right") / len(sd)
            assert abs(rank - r["q"]) <= 0.02, (parts, r["g"], r["q"])


def test_name_edit_pairs_all_edit_kinds(ray_session):
    """The SymSpell deletion-neighborhood join finds ALL three edit
    kinds — substitution, insertion, deletion — and nothing at
    distance 2 (the supplier oracle corpus only exercises equal-length
    substitutions, so the length-changing paths are pinned here)."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import name_edit_pairs

    names = {
        1: "alpha-node",
        2: "alpha-nodx",   # substitution of 1  (dist 1)
        3: "alpha-nodes",  # insertion vs 1     (dist 1)
        4: "alpha-nod",    # deletion vs 1      (dist 1)
        5: "alpha-nxdx",   # dist 2 from 1 — must NOT pair with 1
        6: "zzzz",         # unrelated
    }
    df = pd.DataFrame({"s_suppkey": list(names), "s_name":
                       [names[k] for k in names]})
    for parts in (1, 3):
        got = name_edit_pairs(rd.from_pandas(df).repartition(parts)) \
            .to_pandas()
        pairs = set(zip(got["a"], got["b"]))
        assert (1, 2) in pairs      # substitution
        assert (1, 3) in pairs      # insertion
        assert (1, 4) in pairs      # deletion
        assert (2, 5) in pairs      # nodx→nxdx is one substitution
        assert (1, 5) not in pairs  # distance 2
        assert all(d in (0, 1) for d in got["dist"])
        # 3 vs 4: "alpha-nodes" vs "alpha-nod" is distance 2 — absent
        assert (3, 4) not in pairs


def test_ngram_containment_planted_quote(ray_session):
    """A short doc fully embedded in a long one has containment 1.0 in
    the short→long direction but (by construction) low Jaccard — the
    asymmetric operator surfaces exactly the directed row."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import (
        ngram_containment_pairs)

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [quote, filler + " " + quote + " " + filler,
                 "entirely different content with no shared grams at all"],
    })
    got = ngram_containment_pairs(rd.from_pandas(df), n=3,
                                  threshold=0.9).to_pandas()
    rows = set(zip(got["src"], got["dst"]))
    assert (1, 2) in rows           # quote contained in long doc
    assert (2, 1) not in rows       # long doc NOT contained in quote
    assert not any(3 in r for r in rows)
    c = got[(got["src"] == 1) & (got["dst"] == 2)]["containment"].iloc[0]
    assert c == 1.0


def test_temperature_sample_flattens_and_is_layout_invariant(ray_session):
    """T=2 resampling keeps rare strata nearly whole while downsampling
    the head, and the md5-membership rule makes the kept set identical
    at every block layout."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sampling import (
        temperature_sample)

    rng = np.random.default_rng(17)
    langs = (["en"] * 4000) + (["fr"] * 500) + (["xx"] * 50)
    df = pd.DataFrame({"doc_id": np.arange(len(langs), dtype="int64"),
                       "lang": langs})
    kept_sets = []
    for parts in (1, 7):
        got = temperature_sample(
            rd.from_pandas(df).repartition(parts)).to_pandas()
        kept_sets.append(frozenset(got["doc_id"]))
        share = got["lang"].value_counts(normalize=True)
        raw = pd.Series(langs).value_counts(normalize=True)
        # head compressed, tail inflated vs the raw distribution
        assert share["en"] < raw["en"]
        assert share["xx"] > raw["xx"]
        # rare stratum kept (almost) whole: p_xx should be 1.0
        assert (got["lang"] == "xx").sum() == 50
    assert kept_sets[0] == kept_sets[1]


def test_late_round4_ops_block_layout_invariant(ray_session):
    """ngram_containment_pairs output is identical regardless of input
    block layout — retried blocks and different read parallelism must
    not change the directed pair set. (Only containment is exercised
    here; grouped-KLL layout invariance is pinned separately in
    test_kll_group_quantiles_bounds_and_layouts.)"""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.dedup import (
        ngram_containment_pairs)

    rng = np.random.default_rng(23)
    vocab = "aa bb cc dd ee".split()
    base = " ".join(rng.choice(vocab, size=30))
    docs = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " ff gg hh ii jj kk ll mm"},
            {"doc_id": 3, "text": " ".join(rng.choice(vocab, size=25))}]

    outs = []
    for blocks in (1, 3):
        ds = rd.from_items(docs, override_num_blocks=blocks)
        outs.append(ngram_containment_pairs(ds, n=3, threshold=0.5)
                    .to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert len(outs[0]) > 0  # the planted containment actually fires


def test_bloom_filter_join_parity_and_pruning(ray_session):
    """bloom_filter_join ≡ hash_join on inner and semi (the prefilter
    has no false negatives, the exact join removes false positives),
    and the broadcast-bitmap probe actually PRUNES: with a 5%-of-keys
    small side, far fewer than half the big rows survive the filter."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.join import (
        bloom_filter_join, bloom_key_mask, build_key_bloom, hash_join)

    rng = np.random.default_rng(31)
    big = pd.DataFrame({"k": rng.integers(0, 2000, 20_000)
                        .astype("int64"),
                        "v": np.arange(20_000, dtype="int64")})
    small = pd.DataFrame({"k2": np.arange(0, 100, dtype="int64"),
                          "s": np.arange(100, dtype="int64") * 10})

    import pyarrow as pa_

    big_ds = rd.from_arrow(pa_.Table.from_pandas(big)).repartition(4)
    small_ds = rd.from_arrow(pa_.Table.from_pandas(small))
    for how in ("inner", "semi"):
        a = bloom_filter_join(big_ds, small_ds, on="k",
                              right_on="k2", how=how).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        b = hash_join(big_ds, small_ds, on="k", right_on="k2",
                      how=how).to_pandas() \
            .sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a[sorted(a.columns)], b[sorted(b.columns)])

    # pruning evidence: probe the bitmap directly — survivors ≈ the 5%
    # matching mass, far below half the big side
    bits = build_key_bloom(rd.from_pandas(small.rename(
        columns={"k2": "k"})), "k")
    mask = bloom_key_mask(big["k"].to_numpy(), bits, 1 << 20, 7)
    assert mask.sum() < 0.2 * len(big)
    # no false negatives: every truly-matching row survives
    truly = big["k"].isin(set(small["k2"])).to_numpy()
    assert bool(np.all(mask[truly]))


def test_full_outer_hash_join_parity(ray_session):
    """hash_join(how='full') vs pandas outer merge on a planted key
    layout with left-only, right-only and both-side keys; the key
    column coalesces and the off-side columns come back null with the
    declared dtypes (the _normalize_to contract)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.join import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 3, 5], "lv": [10, 20, 30, 31, 50]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": [200.0, 300.0, 400.0]})
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right),
                    on="k", how="full", n_parts=3)
    got = out.to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)

    exp = left.merge(right, on="k", how="outer") \
        .sort_values(["k", "lv"]).reset_index(drop=True)
    assert list(got["k"]) == list(exp["k"])          # key coalesced
    assert got["k"].notna().all()
    # matched values identical; unmatched are null on the off side
    assert got.loc[got["k"] == 4, "rv"].tolist() == [400.0]
    assert got.loc[got["k"] == 4, "lv"].isna().all()
    assert got.loc[got["k"] == 5, "rv"].isna().all()
    pd.testing.assert_series_equal(
        got["rv"].astype("float64"), exp["rv"].astype("float64"),
        check_names=False)


def test_shortest_paths_cost_vs_hops(ray_session):
    """Weighted min-COST distance must take the 2-edge light route over
    the 1-edge heavy route (where BFS hop distance would stop at 1),
    and the hop bound truncates relaxation at max_hops edges."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import shortest_paths

    # 0 -10-> 3 ; 0 -1-> 1 -2-> 3 ; 3 -1-> 4 : cheapest 0->3 is 3 via
    # two hops, not 10 direct; 4 needs three hops at cost 4
    edges = pd.DataFrame({
        "src": [0, 0, 1, 3],
        "dst": [3, 1, 3, 4],
        "w":   [10, 1, 2, 1]})
    ds = rd.from_pandas(edges)
    # limit 500k = broadcast fast path; limit 0 = forced exchange path
    for limit in (500_000, 0):
        got = shortest_paths(ds, [0], max_hops=3, n_parts=2,
                             node_broadcast_limit=limit)
        dist = dict(zip(got["node_id"], got["dist"]))
        assert dist == {0: 0, 1: 1, 3: 3, 4: 4}, limit
        # with only 1 hop allowed the heavy direct edge wins
        got1 = shortest_paths(ds, [0], max_hops=1, n_parts=2,
                              node_broadcast_limit=limit)
        dist1 = dict(zip(got1["node_id"], got1["dist"]))
        assert dist1 == {0: 0, 1: 1, 3: 10}, limit


def test_copurchase_planted_and_layout_invariant(ray_session, tmp_path):
    """Planted baskets: duplicate (order, part) rows (the multi-
    lineitem case) must collapse before pairing, the Jaccard integers
    must be exact, and a 1-block vs many-block parquet layout must
    produce identical output."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import copurchase_topk

    # baskets: {1,2} x3 orders, {1,3} x1, {2,3} x1; order 4 carries a
    # duplicated (4, 1) row that must NOT inflate any count
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2),
            (4, 1), (4, 1), (4, 3), (5, 2), (5, 3)]
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    outs = []
    for tag, rg in (("one", 10**6), ("many", 2)):
        d = tmp_path / tag
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       d / "lineitem.parquet", row_group_size=rg)
        outs.append(copurchase_topk(str(d), k=10))
    one, many = outs
    pd.testing.assert_frame_equal(one, many)
    got = {(r.p1, r.p2): (r.co_cnt, r.union_cnt, r.jaccard_ppm)
           for r in one.itertuples()}
    # part1 in orders {1,2,3,4}, part2 in {1,2,3,5}, part3 in {4,5}
    assert got[(1, 2)] == (3, 5, 600000)
    assert got[(1, 3)] == (1, 5, 200000)
    assert got[(2, 3)] == (1, 5, 200000)
    assert list(one.itertuples(index=False))[0][:2] == (1, 2)


def test_kcenter_picks_directions_and_layouts(ray_session):
    """Planted geometry: three well-separated direction bundles — k=3
    greedy farthest-point must pick exactly one point per direction
    (diversity), starting from the min id, invariant across block
    layouts; dist_at_pick is non-increasing after the first pick."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.similarity import kcenter_select

    rng = np.random.default_rng(7)
    dirs = np.eye(3)
    vecs, ids = [], []
    for b in range(3):
        for j in range(5):
            v = dirs[b] + rng.normal(0, 0.01, 3)
            vecs.append((v / np.linalg.norm(v)).astype(np.float32))
            ids.append(b * 5 + j)
    df = pd.DataFrame({"vec_id": ids, "embedding": [v.tolist() for v in vecs]})
    outs = []
    for n_blocks in (1, 4):
        ds = rd.from_pandas(df).repartition(n_blocks)
        outs.append(kcenter_select(ds, k=3))
    one, many = outs
    pd.testing.assert_frame_equal(one, many)
    assert one["vec_id"].iloc[0] == 0              # min-id seed
    buckets = sorted(one["vec_id"] // 5)
    assert buckets == [0, 1, 2]                    # one per direction
    d = one["dist_at_pick"].to_numpy()
    assert d[0] == 0.0 and d[1] >= d[2] > 0.5      # far then nearer


def test_kcenter_empty_and_exhaustion_guards(ray_session):
    """Advisor findings: an empty dataset returns a TYPED empty frame
    (not IndexError); k exceeding the distinct-point count stops at
    exhaustion (every remaining point at rounded distance 0) instead
    of re-picking covered points forever."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.similarity import kcenter_select

    empty = rd.from_pandas(pd.DataFrame(
        {"vec_id": pd.Series(dtype="int64"),
         "embedding": pd.Series(dtype="object")}))
    out = kcenter_select(empty, k=3)
    assert len(out) == 0
    assert list(out.columns) == ["sel_rank", "vec_id", "dist_at_pick"]

    # 2 distinct directions, k=5: must stop after 2 picks
    two = rd.from_pandas(pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, 0.0], [1.0, 0.0],
                      [0.0, 1.0], [0.0, 1.0]]}))
    out2 = kcenter_select(two, k=5)
    assert out2["vec_id"].tolist() == [0, 2]
    assert len(out2) == 2


def test_hrw_assignment_churn_and_balance(ray_session):
    """Rendezvous assignment over 10k synthetic keys: resizing 8→9
    shards must move ≈1/9 of keys (HRW's minimal-churn property; modulo
    routing moves ~8/9), movers must land on the NEW shard only, and
    the 8-shard load must be roughly balanced."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.shuffle import hrw_assign

    keys = pd.DataFrame({"k": [f"host{i}.example.com" for i in range(10_000)]})
    out = hrw_assign(rd.from_pandas(keys).repartition(8), "k",
                     n_shards=8, alt_shards=9).to_pandas()
    assert len(out) == 10_000                      # distinct preserved
    frac = out["moved"].mean()
    assert 0.07 < frac < 0.16, frac                # ≈ 1/9 ± noise
    moved = out[out["moved"]]
    assert (moved["shard_alt"] == 8).all()         # only to the new one
    load = out["shard"].value_counts()
    assert load.min() > 0.7 * load.max()           # balanced-ish
    # the 8-shard assignment of surviving keys is untouched by resize
    assert (out[~out["moved"]]["shard"]
            == out[~out["moved"]]["shard_alt"]).all()


def test_interval_join_window_boundaries(ray_session, tmp_path):
    """Planted events: pairs at delta 0 and exactly 30 min are kept
    (inclusive bounds), a click 1 µs past the window and any click
    BEFORE the error are dropped, cross-user pairs never match."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import (
        interval_join_events,
    )

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, t0, 1, "error"),
        (2, t0, 1, "click"),                               # delta 0
        (3, t0 + pd.Timedelta(minutes=30), 1, "click"),    # boundary
        (4, t0 + pd.Timedelta(minutes=30, microseconds=1), 1, "click"),
        (5, t0 - pd.Timedelta(seconds=1), 1, "click"),     # before
        (6, t0 + pd.Timedelta(minutes=5), 2, "click"),     # other user
        (7, t0 + pd.Timedelta(minutes=1), 1, "view"),      # other type
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "events.parquet")
    out = interval_join_events(str(tmp_path)).to_pandas() \
        .sort_values("click_id")
    assert list(out["click_id"]) == [2, 3]
    assert list(out["delta_us"]) == [0, 30 * 60 * 1_000_000]


def test_zorder_layout_prunes_and_is_exact(ray_session, tmp_path):
    """Z-order layout: a small box must read a strict subset of the
    buckets (data skipping is real, not assumed), every box query must
    return exactly the pandas box filter (pruning never loses rows —
    including values outside the stamped quantization bounds, which
    clip into edge cells but still post-filter exactly), and the full
    box returns the whole table."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.layout import (
        zorder_box_query,
        zorder_write,
    )

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "rid": np.arange(4000, dtype=np.int64),
        "x": rng.uniform(0, 100, 4000),
        "y": rng.uniform(0, 100, 4000)})
    # a few out-of-bounds stragglers (appends past the stamped range)
    df.loc[:5, "x"] = [150.0, -10.0, 120.0, 101.0, -1.0, 100.5]
    out_dir = str(tmp_path / "z")

    # non-power-of-two bucket counts silently floored before (pruning
    # stats reported against the wrong total) — now fail fast
    for bad in (20, 0, 3):
        with pytest.raises(ValueError):
            zorder_write(rd.from_pandas(df), out_dir + "bad", "x", "y",
                         x_lo=0, x_hi=100, y_lo=0, y_hi=100,
                         bits=8, n_buckets=bad)
    with pytest.raises(ValueError):          # more bucket bits than code
        zorder_write(rd.from_pandas(df), out_dir + "bad", "x", "y",
                     x_lo=0, x_hi=100, y_lo=0, y_hi=100,
                     bits=2, n_buckets=32)
    zorder_write(rd.from_pandas(df).repartition(4), out_dir, "x", "y",
                 x_lo=0.0, x_hi=100.0, y_lo=0.0, y_hi=100.0,
                 bits=8, n_buckets=16)

    for box_x, box_y in [((10.0, 20.0), (60.0, 70.0)),
                         ((0.0, 100.0), (0.0, 100.0)),
                         ((95.0, 150.0), (0.0, 5.0)),
                         ((42.0, 42.5), (13.0, 13.5))]:
        got, stats = zorder_box_query(out_dir, box_x, box_y)
        exp = df[(df.x >= box_x[0]) & (df.x <= box_x[1])
                 & (df.y >= box_y[0]) & (df.y <= box_y[1])]
        assert sorted(got["rid"]) == sorted(exp["rid"]), (box_x, box_y)
        assert stats["buckets_total"] == 16
    small, stats = zorder_box_query(out_dir, (10.0, 20.0), (60.0, 70.0))
    assert stats["buckets_read"] < stats["buckets_total"]
    assert stats["buckets_read"] >= 1


def test_merge_changelog_semantics(ray_session):
    """CDC apply on a planted changelog: update wins over base, delete
    removes, delete-then-reinsert at higher seq survives, untouched keys
    pass through, inserts appear — layout-invariant across block
    splits."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.join import merge_changelog

    base = pd.DataFrame({
        "k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"],
        "seq": [0, 0, 0, 0], "op": ["U"] * 4})
    delta = pd.DataFrame({
        "k": [2, 3, 3, 5], "v": ["B", "dead", "C2", "e"],
        "seq": [1, 1, 2, 1], "op": ["U", "D", "U", "U"]})
    # k=3: delete at seq1 then re-upsert at seq2 -> survives as C2
    for n_blocks in (1, 3):
        out = merge_changelog(
            rd.from_pandas(base).repartition(n_blocks),
            rd.from_pandas(delta).repartition(n_blocks),
            key="k", n_parts=3).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert dict(zip(out["k"], out["v"])) == \
            {1: "a", 2: "B", 3: "C2", 4: "d", 5: "e"}, n_blocks

    delta2 = delta.copy()
    delta2.loc[delta2["seq"] == 2, "op"] = "D"   # now the delete wins
    out = merge_changelog(rd.from_pandas(base), rd.from_pandas(delta2),
                          key="k", n_parts=3).to_pandas()
    assert 3 not in set(out["k"])


def test_tree_rollup_chain_and_cycle_guard(ray_session):
    """Hand-checked subtree sums on a tiny fanout-2 tree, layout
    invariance, and the max_depth cycle guard fires on a self-loop
    parent function."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import tree_rollup

    # parent = k // 2: 0 <- 1 <- {2,3}, 2 <- {4,5}, 3 <- {6,7}
    df = pd.DataFrame({"k": np.arange(8, dtype=np.int64),
                       "w": np.arange(8, dtype=np.int64) + 1})
    for n_blocks in (1, 4):
        out = tree_rollup(rd.from_pandas(df).repartition(n_blocks),
                          "k", "w", parent_of=lambda k: k // 2,
                          n_parts=3).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        got = dict(zip(out["k"], out["subtree_sum"]))
        assert got == {0: 36, 1: 35, 2: 14, 3: 19, 4: 5, 5: 6,
                       6: 7, 7: 8}, n_blocks
        nd = dict(zip(out["k"], out["n_desc"]))
        assert nd == {0: 8, 1: 7, 2: 3, 3: 3, 4: 1, 5: 1, 6: 1, 7: 1}

    bad = tree_rollup(rd.from_pandas(df), "k", "w",
                      parent_of=lambda k: k, max_depth=5)
    with pytest.raises(Exception, match="max_depth"):
        bad.to_pandas()


def test_tree_rollup_pointer_jump_deep_chain(ray_session):
    """tree_rollup_pj (log-depth doubling): bit-equal to the closure
    path on a shallow fanout tree; exact on a 200-deep CHAIN the
    closure's default max_depth=64 refuses (the unbounded-depth
    criterion); layout-invariant; raises on a missing interior parent
    key (the structural-rows contract)."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.analytics import (
        tree_rollup,
        tree_rollup_pj,
    )

    n = 300
    df = pd.DataFrame({"k": np.arange(1, n + 1, dtype=np.int64),
                       "w": np.arange(1, n + 1, dtype=np.int64) % 7 + 1})
    a = tree_rollup(rd.from_pandas(df), "k", "w",
                    parent_of=lambda k: k // 4).to_pandas() \
        .sort_values("k").reset_index(drop=True).astype("int64")
    b = tree_rollup_pj(rd.from_pandas(df), "k", "w",
                       parent_of=lambda k: k // 4,
                       n_parts=2).to_pandas() \
        .sort_values("k").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(a, b)

    m = 200
    chain = pd.DataFrame({"k": np.arange(1, m + 1, dtype=np.int64),
                          "w": np.ones(m, dtype=np.int64)})
    with pytest.raises(Exception, match="max_depth"):
        tree_rollup(rd.from_pandas(chain), "k", "w",
                    parent_of=lambda k: k - 1).to_pandas()
    out = tree_rollup_pj(
        rd.from_pandas(chain).repartition(3), "k", "w",
        parent_of=lambda k: k - 1, n_parts=2).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    got = dict(zip(out["k"].astype(int),
                   out["subtree_sum"].astype(int)))
    want = {k: m - k + 1 for k in range(1, m + 1)}
    want[0] = m                           # synthesized root
    assert got == want

    missing = pd.DataFrame({"k": np.array([5, 6], dtype=np.int64),
                            "w": np.ones(2, dtype=np.int64)})
    with pytest.raises(ValueError, match="missing"):
        tree_rollup_pj(rd.from_pandas(missing), "k", "w",
                       parent_of=lambda k: k - 1)


def test_copurchase_join_path_parity(ray_session, tmp_path):
    """Forcing freq_broadcast_rows=0 routes the frequency lookups
    through the hash_join exchanges — output must match the broadcast
    path exactly (the dedup-family two-path pin)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from stimson_web_scraper_ray.pipelines.analytics import copurchase_topk

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "l_orderkey": rng.integers(0, 300, 2000),
        "l_partkey": rng.integers(0, 40, 2000)})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   d / "lineitem.parquet")
    a = copurchase_topk(str(d), k=50)
    b = copurchase_topk(str(d), k=50, freq_broadcast_rows=0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 50 and (a["co_cnt"].to_numpy() >= 1).all()


def test_zorder_empty_region_keeps_schema(ray_session, tmp_path):
    """Clustered data (one corner only → most buckets have no files):
    a box over the empty region returns a TYPED empty frame with the
    same columns as a hit query — and the bucket-prefix enumeration
    still prunes to a strict bucket subset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.layout import (
        zorder_box_query,
        zorder_write,
    )

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "rid": np.arange(500, dtype=np.int64),
        "x": rng.uniform(0, 10, 500),     # bottom-left corner only
        "y": rng.uniform(0, 10, 500)})
    out_dir = str(tmp_path / "z")
    zorder_write(rd.from_pandas(df), out_dir, "x", "y",
                 0.0, 100.0, 0.0, 100.0, bits=8, n_buckets=16)
    empty, stats = zorder_box_query(out_dir, (90.0, 99.0), (90.0, 99.0))
    assert len(empty) == 0
    assert list(empty.columns) == ["rid", "x", "y"]
    assert stats["buckets_read"] < stats["buckets_total"]
    hit, _ = zorder_box_query(out_dir, (0.0, 10.0), (0.0, 10.0))
    assert list(hit.columns) == list(empty.columns)
    assert len(hit) == 500


def test_walk_corpus_paths_and_dead_ends(ray_session):
    """CSR-broadcast vs exchange path parity on the same graph (forced
    zero edge limit), dead-end walks stop early, and every step follows
    an actual edge."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import walk_corpus

    edges = pd.DataFrame({
        "src": [0, 0, 1, 1, 2, 3],
        "dst": [1, 2, 0, 3, 0, 1]})   # node 4 isolated; 3 -> 1 only
    starts = pd.DataFrame({"walk_id": np.array([0, 3, 4], np.int64)})
    e_ds, s_ds = rd.from_pandas(edges), rd.from_pandas(starts)
    a = walk_corpus(e_ds, s_ds, walk_len=3)
    b = walk_corpus(e_ds, s_ds, walk_len=3, edge_broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b)
    # isolated start emits only its step-0 row
    assert len(a[a["walk_id"] == 4]) == 1
    # full-length walks emit walk_len+1 rows
    assert len(a[a["walk_id"] == 0]) == 4
    edge_set = set(zip(edges["src"], edges["dst"]))
    for wid, g in a.groupby("walk_id"):
        seq = g.sort_values("step")["node"].tolist()
        assert seq[0] == wid
        for u, v in zip(seq, seq[1:]):
            assert (u, v) in edge_set, (wid, u, v)


def test_coverage_select_greedy_properties(ray_session):
    """Planted vocabulary: the greedy must pick the doc with most words
    first, then the doc adding most NEW words (not the globally second-
    largest), ties break to lower id, covered_words is the running
    union size — layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sampling import coverage_select

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c d e",          # 5 words — first pick
                 "a b c d",            # 4 words but only subset -> 0 new
                 "f g h",              # 3 new words — second pick
                 "a f x"]})            # then adds only 'x'
    for n_blocks in (1, 3):
        out = coverage_select(
            rd.from_pandas(docs).repartition(n_blocks), k=3)
        assert list(out["doc_id"]) == [0, 2, 3], n_blocks
        assert list(out["new_words"]) == [5, 3, 1]
        assert list(out["covered_words"]) == [5, 8, 9]


def test_coverage_select_stops_when_exhausted(ray_session):
    """Once every word is covered the greedy STOPS instead of
    re-picking a zero-gain doc (review finding): k=4 over a 2-doc
    vocabulary yields 2 rows, no duplicate doc_ids."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.sampling import coverage_select

    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "a c"]})
    out = coverage_select(rd.from_pandas(docs), k=4)
    assert list(out["doc_id"]) == [0, 1]
    assert list(out["new_words"]) == [2, 1]
    assert out["doc_id"].is_unique


def test_walk_corpus_duplicate_starts_parity(ray_session):
    """Duplicate walk_id rows in starts_ds must NOT diverge the two
    physical paths (review finding): both dedupe to one walk per id."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.graph import walk_corpus

    edges = pd.DataFrame({"src": [0, 0, 1], "dst": [1, 2, 0]})
    starts = pd.DataFrame({"walk_id": np.array([0, 0, 0], np.int64)})
    a = walk_corpus(rd.from_pandas(edges), rd.from_pandas(starts),
                    walk_len=2)
    b = walk_corpus(rd.from_pandas(edges), rd.from_pandas(starts),
                    walk_len=2, edge_broadcast_limit=0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 3 and list(a["step"]) == [0, 1, 2]


def test_merge_inverted_index_refetch(ray_session, tmp_path):
    """Re-fetched page: delta carries the NEW text and the doc id rides
    removed_doc_ids — stale base postings purge, fresh delta postings
    survive (filtering the unioned lists stripped them — review
    finding), and the merged artifact equals a fresh build over the
    updated corpus. Empty delta + no tombstones = pure copy."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines.index import (
        build_inverted_index,
        merge_inverted_index,
        write_inverted_index,
    )

    base = pd.DataFrame({"doc_id": [1, 2],
                         "text": ["apple banana", "cherry apple"]})
    old_dir = str(tmp_path / "old")
    write_inverted_index(build_inverted_index(rd.from_pandas(base)),
                         old_dir, n_partitions=8)

    # doc 1 re-fetched: 'apple banana' -> 'banana date'
    delta = pd.DataFrame({"doc_id": [1], "text": ["banana date"]})
    out_dir = str(tmp_path / "merged")
    merge_inverted_index(old_dir, rd.from_pandas(delta), out_dir,
                         n_partitions=8, removed_doc_ids=[1])

    updated = pd.DataFrame({"doc_id": [1, 2],
                            "text": ["banana date", "cherry apple"]})
    fresh = build_inverted_index(rd.from_pandas(updated)).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    import glob
    import pyarrow.parquet as pq
    got = pd.concat([pq.read_table(f).to_pandas() for f in
                     glob.glob(out_dir + "/part=*/*.parquet")],
                    ignore_index=True) \
        .sort_values("term").reset_index(drop=True)
    got["postings"] = got["postings"].map(list)
    fresh["postings"] = fresh["postings"].map(list)
    pd.testing.assert_frame_equal(got, fresh)

    # empty delta, no tombstones: straight copy, no KeyError
    import ray.data as rd2
    empty = rd2.from_pandas(pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                          "text": pd.Series(dtype=object)}))
    out2 = str(tmp_path / "copied")
    merge_inverted_index(old_dir, empty, out2, n_partitions=8)
    got2 = pd.concat([pq.read_table(f).to_pandas() for f in
                      glob.glob(out2 + "/part=*/*.parquet")],
                     ignore_index=True)
    assert sorted(got2["term"]) == ["apple", "banana", "cherry"]

    # partition-count mismatch is refused loudly
    import pytest
    with pytest.raises(ValueError, match="n_partitions"):
        merge_inverted_index(old_dir, rd.from_pandas(delta),
                             str(tmp_path / "bad"), n_partitions=16)


def test_bpe_batched_self_adjacent_counterexample(ray_session):
    """The review-confirmed a==b hole: a corpus where merging (b,b)
    creates (bb,b) whose count outranks a lower batch member — batched
    training must still equal the cap=1 sequential sequence (the
    self-adjacent pair now terminates its batch)."""
    import pandas as pd
    import ray.data as rd

    from stimson_web_scraper_ray.pipelines import bpe

    # word freqs {bbb:9, ddcc:2, ccddaddd:3} via repeated docs
    docs = (["bbb"] * 9) + (["ddcc"] * 2) + (["ccddaddd"] * 3)
    ds = rd.from_pandas(pd.DataFrame({"text": docs}))
    seq, _ = bpe.bpe_train(ds, n_merges=6, max_round_merges=1)
    for cap in (2, 3, 64):
        got, _ = bpe.bpe_train(ds, n_merges=6, max_round_merges=cap)
        assert got == seq, f"cap={cap}: {got} != {seq}"
