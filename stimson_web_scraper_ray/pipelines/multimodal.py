"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with sidecar metadata
(mime, width/height, duration). Decode / feature-extract / resize /
frame-sample are actor-pool ``map_batches`` stages. The image tier has
one REAL codec — binary PPM / netpbm P6 (``encode_ppm``/``decode_ppm``,
pure numpy, no image libs needed) — used end to end for decode,
features and resize (resized output is an openable PPM). Compressed
formats (jpeg/png) and audio/video codecs are absent from this
container, so those rows use a deterministic fake codec behind
``fake=True`` or raise ``NotImplementedError``; the Ray-side plumbing —
schema, small batch sizes for wide binary rows, actor signature, output
layout — is identical for real and fake rows and fully tested.

At 100 TB: binary rows are MBs, so ``batch_size`` stays small (32 here vs
4096 for text), blocks stay within ``target_max_block_size``, and outputs
write per-shard parquet directories.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.string()),         # JSON sidecar
])


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic fake codec: payload hash → (h, w, 3) uint8 array.
    Stands in for a real decoder; same input → same pixels."""
    h = hashlib.blake2b(payload or b"", digest_size=16).digest()
    hh = 8 + h[0] % 8
    ww = 8 + h[1] % 8
    rng = np.random.default_rng(struct.unpack("<Q", h[8:16])[0])
    return rng.integers(0, 256, size=(hh, ww, 3), dtype=np.uint8)


# --- real codec: PPM P6 (netpbm) — pure numpy, no image libs needed ---------

PPM_MIME = "image/x-portable-pixmap"


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6). A real, openable image format."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles '#' comments and any
    whitespace between header tokens per the netpbm spec."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval — then ONE
    # whitespace byte precedes the raster
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos:pos + 1]
        if c == b"#":                      # comment to end of line
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < n and not payload[end:end + 1].isspace():
                end += 1
            tokens.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                           offset=pos + 1)
    return raster.reshape(h, w, 3)


def _decode_image(payload: bytes, mime: str, fake: bool) -> np.ndarray:
    """Per-row decoder dispatch: PPM decodes for REAL (pure numpy);
    other mimes fall back to the deterministic fake codec when
    ``fake=True`` and raise otherwise (no jpeg/png libs here)."""
    if mime == PPM_MIME:
        return decode_ppm(payload)
    if fake:
        return _fake_decode_image(payload)
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; "
        "use PPM payloads or fake=True")


class ImageDecodeFeatures:
    """Actor-pool stage: binary payload → decoded dims + channel-mean
    features. PPM payloads decode for real (pure numpy); other mimes use
    the deterministic fake codec when ``fake=True`` (no jpeg/png libs in
    this container) and raise otherwise."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mimes = batch["mime"].to_pylist()
        widths = np.zeros(len(payloads), dtype=np.int32)
        heights = np.zeros(len(payloads), dtype=np.int32)
        means = []
        ok = np.ones(len(payloads), dtype=bool)
        for i, (p, m) in enumerate(zip(payloads, mimes)):
            # per-row isolation (same contract as the extract stage): a
            # corrupt payload degrades to a zero-dim error row, never
            # kills the block. NotImplementedError (no codec for the
            # mime) still raises — that is a config error, not bad data.
            try:
                img = _decode_image(p, m, self.fake)
            except NotImplementedError:
                raise
            except Exception:
                ok[i] = False
                means.append([])
                continue
            if img.size == 0:            # legal header, degenerate dims
                ok[i] = False
                means.append([])
                continue
            heights[i], widths[i] = img.shape[0], img.shape[1]
            means.append(np.round(img.reshape(-1, 3).mean(axis=0), 2).tolist())
        out = batch.select(["media_id", "mime"])
        out = out.append_column("width", pa.array(widths, pa.int32()))
        out = out.append_column("height", pa.array(heights, pa.int32()))
        out = out.append_column("channel_mean",
                                pa.array(means, pa.list_(pa.float64())))
        out = out.append_column("decode_ok", pa.array(ok, pa.bool_()))
        return out


class FrameSampler:
    """Video → every-Nth-frame sample (stubbed decode; real batch/output
    plumbing: one row per sampled frame, list→rows explode)."""

    def __init__(self, every_n: int = 10, fake: bool = False):
        self.every_n = every_n
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "no video codec in this environment; use fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            n_frames = 1 + (len(p or b"") % 50)
            for f in range(0, n_frames, self.every_n):
                ids.append(mid)
                idxs.append(f)
                frames.append(_fake_decode_image(
                    (p or b"") + f.to_bytes(4, "little")).tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic media table for tests/benchmarks. Even ids carry
    REAL binary-PPM images (decoded by the pure-numpy codec, no fake
    involved); odd ids carry opaque bytes for the fake-codec path — so
    one table exercises both decoder branches."""
    rng = np.random.default_rng(seed)
    payloads, mimes = [], []
    for i in range(n):
        if i % 2 == 0:
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img))
            mimes.append(PPM_MIME)
        else:
            payloads.append(rng.integers(
                0, 256, size=int(rng.integers(64, 4096)),
                dtype=np.uint8).tobytes())
            mimes.append("image/fake")
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "mime": pa.array(mimes, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(["{}"] * n, pa.string()),
    })


def decode_pipeline(ds, fake: bool = True):
    """The assembled stage with scale-appropriate sizing (small batches for
    wide binary rows, autoscaling actor pool)."""
    return ds.map_batches(
        ImageDecodeFeatures, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4), fn_constructor_kwargs={"fake": fake})

# --- top-image selection over synthesized candidate dims -------------------

# one candidate list per document, in page order; names exercise every
# calculate_area gate (sprite/logo penalty, small, banner-shaped, normal)
_IMG_NAMES = ("logo.png", "sprite-nav.png", "photo-2.jpg",
              "hero-3.jpg", "art-4.jpg")


def _synth_dims(url: str) -> tuple[int, int]:
    """Deterministic (width, height) from md5(url) — little-endian 64-bit
    halves so DuckDB's md5_number_upper/lower reproduce them bit-exact
    (upper = bytes 0..8 LE, lower = bytes 8..16 LE)."""
    import hashlib

    d = hashlib.md5(url.encode("utf-8")).digest()
    lower = int.from_bytes(d[8:16], "little")
    upper = int.from_bytes(d[:8], "little")
    return 40 + lower % 1400, 40 + upper % 1000


def top_image_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Per-document largest_image_url (image_extractor.py:183-224) over
    synthesized candidate dims — the dims stand in for the decode stage's
    (url, width, height) sidecar; the selection algebra is the real one."""
    from ..functions.images import score_image, select_top_image

    doc_ids = batch[id_col].to_pylist()
    tops, areas = [], []
    for doc_id in doc_ids:
        cands = []
        for name in _IMG_NAMES:
            url = f"http://img.example.com/d{doc_id}/{name}"
            w, h = _synth_dims(url)
            cands.append((url, w, h))
        best = select_top_image(cands)
        tops.append(best)
        areas.append(round(max((score_image(u, w, h) for u, w, h in cands
                                if u == best), default=0.0), 2)
                     if best else 0.0)
    return pa.table({
        id_col: batch[id_col],
        "top_image": pa.array(tops, pa.string()),
        "best_area": pa.array(areas, pa.float64()),
    })


def top_image_table(ds, id_col: str = "doc_id"):
    """Dataset wiring: one map_batches, no shuffle, no driver rows."""
    return ds.map_batches(lambda b: top_image_batch(b, id_col),
                          batch_format="pyarrow")


class ImageResize:
    """Actor-pool resize stage: payload → fixed (out_h, out_w) thumbnail
    payload + dims. The resampler is real (vectorized nearest-neighbor
    index math); PPM rows decode AND re-encode through the real codec —
    the output thumbnail is an openable PPM — while other mimes use the
    fake codec (fake=True) and emit raw RGB bytes. Output stays a binary
    column, so resize stages chain/write like any other media stage."""

    def __init__(self, out_w: int = 8, out_h: int = 8, fake: bool = False):
        self.out_w = out_w
        self.out_h = out_h
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        out_p, out_m = [], []
        ok = np.ones(len(ids), dtype=bool)
        widths = np.full(len(ids), self.out_w, np.int32)
        heights = np.full(len(ids), self.out_h, np.int32)
        for i, (p, m) in enumerate(zip(batch["payload"].to_pylist(),
                                       batch["mime"].to_pylist())):
            try:
                img = _decode_image(p, m, self.fake)
            except NotImplementedError:
                raise
            except Exception:
                img = None           # corrupt payload → empty error row
            if img is None or img.size == 0:
                ok[i] = False
                widths[i] = heights[i] = 0   # dims must not lie
                out_p.append(b"")
                out_m.append(m)
                continue
            h, w = img.shape[0], img.shape[1]
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            thumb = img[yi][:, xi]
            if m == PPM_MIME:
                out_p.append(encode_ppm(thumb))
            else:
                out_p.append(thumb.tobytes())
            out_m.append(m)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(out_m, pa.string()),
            "payload": pa.array(out_p, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


# --- real codec: WAV / PCM-16 (RIFF) — pure stdlib `wave` -------------------

WAV_MIME = "audio/wav"


def encode_wav(samples: np.ndarray, sr: int = 16_000) -> bytes:
    """float waveform in [-1, 1] → mono PCM-16 WAV (playable RIFF)."""
    import io
    import wave

    ints = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV → (float32 waveform in [-1, 1] mono-mixed, sample
    rate). Pure stdlib parse; no audio libs."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError("only PCM-16 WAV supported")
        raw = w.readframes(w.getnframes())
    ints = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    if ch > 1:
        ints = ints.reshape(-1, ch).mean(axis=1)
    return ints / 32767.0, sr


class AudioFeatures:
    """Actor-pool audio stage: payload → duration / RMS / zero-crossing
    features. WAV payloads decode for REAL (stdlib RIFF/PCM-16 parse);
    other mimes use the deterministic hash-waveform fake behind
    ``fake=True`` (no mp3/ogg codecs here) or raise. The feature math
    (vectorized rms, sign-change count) is identical either way."""

    SR = 16_000

    def __init__(self, fake: bool = False):
        self.fake = fake

    @staticmethod
    def _fake_decode(payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload or b"", digest_size=16).digest()
        n = 1000 + struct.unpack("<I", h[0:4])[0] % 15_000
        rng = np.random.default_rng(struct.unpack("<Q", h[8:16])[0])
        return (rng.random(n) * 2.0 - 1.0).astype(np.float32)

    def _decode(self, payload: bytes, mime: str) -> tuple[np.ndarray, int]:
        if mime == WAV_MIME:
            return decode_wav(payload)
        if self.fake:
            return self._fake_decode(payload), self.SR
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment; "
            "use WAV payloads or fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        dur, rms, zcr = [], [], []
        ok = np.ones(len(ids), dtype=bool)
        for i, (p, m) in enumerate(zip(batch["payload"].to_pylist(),
                                       batch["mime"].to_pylist())):
            try:
                w, sr = self._decode(p, m)
            except NotImplementedError:
                raise
            except Exception:
                w, sr = None, 0      # corrupt payload → zeroed error row
            if w is None or sr <= 0 or len(w) == 0:
                # includes a legal header declaring framerate 0
                ok[i] = False
                dur.append(0.0)
                rms.append(0.0)
                zcr.append(0)
                continue
            dur.append(round(len(w) / sr, 6))
            rms.append(round(float(np.sqrt(np.mean(w * w))), 6)
                       if len(w) else 0.0)
            zcr.append(int(np.count_nonzero(np.diff(np.sign(w)))))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "duration_s": pa.array(dur, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
            "zero_crossings": pa.array(zcr, pa.int64()),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


def synth_audio_table(n: int = 64, seed: int = 11) -> pa.Table:
    """Deterministic audio table: even ids carry REAL PCM-16 WAV clips
    (sine + noise mixtures), odd ids opaque bytes for the fake path."""
    rng = np.random.default_rng(seed)
    payloads, mimes = [], []
    sr = 16_000
    for i in range(n):
        if i % 2 == 0:
            dur = 0.05 + float(rng.random()) * 0.2
            t = np.arange(int(sr * dur)) / sr
            f = 100.0 + float(rng.random()) * 3000.0
            wav = (0.6 * np.sin(2 * np.pi * f * t)
                   + 0.1 * rng.standard_normal(len(t)))
            payloads.append(encode_wav(wav, sr))
            mimes.append(WAV_MIME)
        else:
            payloads.append(rng.integers(
                0, 256, size=int(rng.integers(64, 4096)),
                dtype=np.uint8).tobytes())
            mimes.append("audio/fake")
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "mime": pa.array(mimes, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(["{}"] * n, pa.string()),
    })


def media_similarity(ds, query_media_id: int = 0, k: int = 10,
                     fake: bool = True):
    """Multimodal → similarity composition: decode+feature stage feeds
    the brute-force cosine top-k operator on the channel_mean feature
    column — the same broadcast-query / per-batch-partial-top-k shape as
    text-embedding ANN, demonstrating that media features are ordinary
    vector columns to the engine."""
    import pyarrow.compute as pc

    from .similarity import brute_force_topk

    # drop failed-decode rows (empty channel_mean would make the
    # downstream vector matrix ragged and crash the scorer)
    feats = decode_pipeline(ds, fake=fake).map_batches(
        lambda t: t.filter(pc.equal(t["decode_ok"], True)),
        batch_format="pyarrow")
    q = feats.map_batches(
        lambda t: t.filter(pc.equal(t["media_id"], query_media_id)),
        batch_format="pyarrow").to_pandas()
    qvec = np.array(q["channel_mean"].tolist(), dtype=np.float64)
    return brute_force_topk(feats, qvec, k=k, id_col="media_id",
                            vec_col="channel_mean")


# --- perceptual near-dup: average hash (aHash) ------------------------------


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 area-mean pooling (exact
    block boundaries via reduceat, so integer-factor upscales of
    8-multiple images pool to IDENTICAL blocks) → bit i set iff block i
    is brighter than the image's pooled mean. Invariant to global
    brightness shifts (threshold moves with the pixels) and to
    nearest-neighbor integer upscaling; sensitive to content."""
    g = img.astype(np.float64).mean(axis=2)
    h, w = g.shape
    if h < 8 or w < 8:  # tile tiny images so 8×8 pooling is defined
        g = np.repeat(np.repeat(g, -(-8 // h), axis=0),
                      -(-8 // w), axis=1)
        h, w = g.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(8) * w) // 8
    pooled = np.add.reduceat(np.add.reduceat(g, ri, axis=0), ci, axis=1)
    area = np.outer(np.diff(np.append(ri, h)), np.diff(np.append(ci, w)))
    pooled = pooled / area
    bits = (pooled > pooled.mean()).ravel()
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])


class ImageAHash:
    """Actor-pool stage: payload → 64-bit perceptual hash. Codec
    dispatch is the shared _decode_image (real PPM, fake fallback);
    per-row decode is inherent (opaque binary payloads), the hash math
    is vectorized numpy per image."""

    def __init__(self, fake: bool = True):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (ahash64(_decode_image(p.as_py(), m.as_py(), self.fake))
             for p, m in zip(batch["payload"], batch["mime"])),
            dtype=np.uint64, count=batch.num_rows)
        return pa.table({"media_id": batch["media_id"],
                         "ahash": pa.array(hs, pa.uint64())})


def image_ahash_pairs(ds, max_hamming: int = 7, fake: bool = True):
    """Image near-duplicate pairs: aHash actor pool (small batches for
    wide binary rows) → the generic hamming_near_dup_pairs core with
    8×8-bit chunks (pigeonhole guarantee for d ≤ 7). The exchange
    carries (media_id, ahash) — 16 bytes/image, never pixels."""
    from .dedup import hamming_near_dup_pairs

    hashed = ds.map_batches(
        ImageAHash, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4), fn_constructor_kwargs={"fake": fake})
    return hamming_near_dup_pairs(hashed, "ahash", id_col="media_id",
                                  max_hamming=max_hamming, n_chunks=8)


def synth_media_with_dups(n_base: int = 40, seed: int = 13) -> pa.Table:
    """Planted-duplicate media table: each base image (real PPM, dims a
    multiple of 8, pixels in [30, 220] so shifts never clip) ships with
    a +8-brightness copy and a 2× nearest-upscale copy — both aHash-
    invariant transforms. Ids: base 3i, bright 3i+1, upscaled 3i+2; the
    ground truth is every within-triple pair."""
    rng = np.random.default_rng(seed)
    ids, payloads, mimes = [], [], []
    for i in range(n_base):
        h = 8 * int(rng.integers(1, 4))
        w = 8 * int(rng.integers(1, 4))
        img = rng.integers(30, 221, size=(h, w, 3), dtype=np.uint8)
        bright = img + np.uint8(8)
        up = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)
        for j, m in enumerate((img, bright, up)):
            ids.append(3 * i + j)
            payloads.append(encode_ppm(m))
            mimes.append(PPM_MIME)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "mime": pa.array(mimes, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(["{}"] * len(ids), pa.string()),
    })
