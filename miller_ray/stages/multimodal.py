"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode coverage in this container (no Pillow/soundfile/ffmpeg):
- REAL decode for codec-free formats: PCM WAV audio (stdlib ``wave``
  header parse + numpy PCM conversion, log-energy band features via
  numpy FFT) and netpbm P5/P6 / uncompressed 24-bit BMP images (pure
  numpy). These run under ``use_fake=False`` in the same actor-pool
  stages.
- Compressed formats (JPEG/PNG/MP3/MP4) still raise
  NotImplementedError without the optional codec libraries, and the
  deterministic fake (``use_fake=True``) remains for tests over random
  payloads. The Ray-side plumbing — schema, actor-pool signature,
  batch sizing for large binary payloads, output layout — is identical
  on both paths.

Scale notes: binary payloads make rows wide — size ``batch_size`` small
(64-256) so batch x concurrency fits worker heaps, and keep these
stages in ``batch_format="pyarrow"`` (binary columns round-trip poorly
through pandas object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from miller_ray.hashing import hash64

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV payload to (samples[n, channels] float64 in
    [-1, 1], sample_rate) with stdlib ``wave`` — no codec libraries.
    Supports 8/16/32-bit integer PCM."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:      # unsigned 8-bit
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    return x.reshape(-1, n_ch), rate


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode binary netpbm (P5 grayscale / P6 RGB, maxval<=255) to a
    uint8 HxWxC array with pure numpy."""
    if payload[:2] not in (b"P5", b"P6"):
        raise NotImplementedError("only binary P5/P6 netpbm supported")
    # header = magic, width, height, maxval as whitespace/comment-separated
    # ASCII tokens followed by ONE whitespace byte, then raster
    toks, i, tok = [], 2, b""
    while len(toks) < 3:
        c = payload[i:i + 1]
        i += 1
        if c == b"#":                       # comment to end-of-line
            while payload[i:i + 1] not in (b"\n", b""):
                i += 1
        elif c.isspace():
            if tok:
                toks.append(tok)
                tok = b""
        else:
            tok += c
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    arr = np.frombuffer(payload, np.uint8, count=w * h * ch, offset=i)
    return arr.reshape(h, w, ch)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BMP to uint8 HxWx3 (RGB) with pure
    numpy."""
    if payload[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    flip = h > 0                   # positive height = bottom-up raster
    h = abs(h)
    stride = (w * 3 + 3) & ~3      # rows padded to 4 bytes
    rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    img = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)[..., ::-1]  # BGR->RGB
    return img[::-1] if flip else img


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes to a codec-free decoder (netpbm / BMP);
    compressed formats need optional libraries not in this container."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode (JPEG/PNG/...) requires Pillow; only "
        "netpbm P5/P6 and uncompressed 24-bit BMP decode codec-free")


MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),       # opaque encoded bytes
    ("media_type", pa.string()),    # "image/jpeg", "audio/wav", ...
    ("width", pa.int32()),          # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


class ImageFeatureExtractor:
    """Actor-pool stage: decode + feature-extract images.

    __init__ loads the decoder/model once per actor; __call__ processes a
    batch. With ``use_fake=True`` emits a deterministic 8-dim feature
    derived from the payload hash (lets pipelines and tests run over
    random payloads). With ``use_fake=False`` REALLY decodes codec-free
    formats (netpbm P5/P6, uncompressed BMP; Pillow for the rest when
    importable) and emits per-channel mean/std + a luminance histogram,
    normalized to feature_dim."""

    def __init__(self, use_fake: bool = True, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.use_fake = use_fake
        if not use_fake:
            try:  # optional: widens coverage to JPEG/PNG when present
                import PIL.Image
                self._pil = PIL.Image
            except ImportError:
                self._pil = None

    def _decode(self, payload: bytes) -> np.ndarray:
        try:
            return decode_image(payload)
        except NotImplementedError:
            if self._pil is None:
                raise
            import io  # pragma: no cover - Pillow absent in this container
            return np.asarray(self._pil.open(io.BytesIO(payload)).convert("RGB"))

    def _features(self, img: np.ndarray) -> np.ndarray:
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        x = img.astype(np.float64) / 255.0
        lum = x.mean(axis=2)
        hist, _ = np.histogram(lum, bins=max(self.feature_dim - 6, 2), range=(0, 1))
        hist = hist / max(lum.size, 1)
        f = np.concatenate([x.mean(axis=(0, 1)), x.std(axis=(0, 1)), hist])
        return (f[:self.feature_dim] if f.size >= self.feature_dim
                else np.pad(f, (0, self.feature_dim - f.size)))

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.use_fake:
            feats = np.stack([self._features(self._decode(p.as_py()))
                              for p in t["payload"]]) if t.num_rows else \
                np.zeros((0, self.feature_dim))
        else:
            h = hash64(t["payload"])
            feats = np.stack([
                (hash64(h, seed=i).astype(np.float64) / 2**64)
                for i in range(self.feature_dim)], axis=1) if t.num_rows else \
                np.zeros((0, self.feature_dim))
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.feature_dim)
        return pa.table({"media_id": t["media_id"], "features": feat_col})


def extract_image_features(ds, concurrency=(1, 4), batch_size: int = 128,
                           use_fake: bool = True):
    """Feature extraction over a media table — small batches (binary
    payloads), actor pool, Arrow in/out. ``use_fake=False`` uses the
    real codec-free decoders (netpbm/BMP)."""
    return ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          batch_size=batch_size,
                          fn_constructor_kwargs={"use_fake": use_fake})


def make_fake_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table matching MEDIA_SCHEMA (payload =
    seeded pseudo-random bytes; sizes in plausible ranges)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(s), dtype=np.uint8).tobytes()
                for s in rng.integers(512, 4096, size=n)]
    return pa.table({
        "media_id": pa.array([f"img-{i:08d}" for i in range(n)]),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(["image/jpeg"] * n),
        "width": pa.array(rng.integers(64, 1024, size=n).astype(np.int32)),
        "height": pa.array(rng.integers(64, 1024, size=n).astype(np.int32)),
        "duration_ms": pa.nulls(n, pa.int32()),
    })


def make_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REALLY decodable
    without codecs: alternating PCM-WAV sine tones, P6 PPM gradients,
    and uncompressed 24-bit BMPs — for testing the ``use_fake=False``
    decode paths end-to-end."""
    import io
    import struct
    import wave

    rng = np.random.default_rng(seed)
    ids, payloads, types, ws, hs, durs = [], [], [], [], [], []
    for i in range(n):
        kind = i % 3
        if kind == 0:  # 16-bit mono WAV, 50 ms sine at a seeded pitch
            rate, ms = 16000, 50
            t = np.arange(int(rate * ms / 1000)) / rate
            freq = float(rng.integers(200, 2000))
            pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
            buf = io.BytesIO()
            with wave.open(buf, "wb") as wv:
                wv.setnchannels(1); wv.setsampwidth(2); wv.setframerate(rate)
                wv.writeframes(pcm.tobytes())
            payloads.append(buf.getvalue()); types.append("audio/wav")
            ws.append(None); hs.append(None); durs.append(ms)
        else:
            w, h = int(rng.integers(8, 32)), int(rng.integers(8, 32))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if kind == 1:  # binary P6 PPM
                payloads.append(b"P6\n%d %d\n255\n" % (w, h) + img.tobytes())
                types.append("image/x-portable-pixmap")
            else:          # bottom-up uncompressed 24-bit BMP
                stride = (w * 3 + 3) & ~3
                raster = np.zeros((h, stride), np.uint8)
                raster[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
                data = raster.tobytes()
                hdr = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                       + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                     len(data), 2835, 2835, 0, 0))
                payloads.append(hdr + data); types.append("image/bmp")
            ws.append(w); hs.append(h); durs.append(None)
        ids.append(f"media-{i:08d}")
    return pa.table({
        "media_id": pa.array(ids),
        "payload": pa.array(payloads, type=pa.binary()),
        "media_type": pa.array(types),
        "width": pa.array(ws, type=pa.int32()),
        "height": pa.array(hs, type=pa.int32()),
        "duration_ms": pa.array(durs, type=pa.int32()),
    })


class AudioFeatureExtractor:
    """Actor-pool stage: decode + feature-extract audio.

    ``use_fake=False`` REALLY decodes PCM WAV (stdlib ``wave``, see
    :func:`decode_wav`) and computes log-energies in ``n_mels``
    mel-spaced frequency bands via numpy FFT — the filterbank is built
    once per actor in __init__. Compressed audio (MP3/OGG/...) needs
    soundfile/ffmpeg, absent here. ``use_fake=True`` keeps the
    hash-deterministic features for tests over random payloads."""

    def __init__(self, use_fake: bool = True, n_mels: int = 16,
                 n_fft: int = 1024):
        self.use_fake = use_fake
        self.n_mels = n_mels
        self.n_fft = n_fft
        self._fb_cache: dict[int, np.ndarray] = {}

    def _filterbank(self, rate: int) -> np.ndarray:
        fb = self._fb_cache.get(rate)
        if fb is None:
            # triangular mel filters: mel(f) = 2595 log10(1 + f/700)
            n_bins = self.n_fft // 2 + 1
            freqs = np.linspace(0, rate / 2, n_bins)
            mel_pts = np.linspace(0.0, 2595.0 * np.log10(1 + rate / 1400.0),
                                  self.n_mels + 2)
            hz_pts = 700.0 * (10 ** (mel_pts / 2595.0) - 1)
            fb = np.zeros((self.n_mels, n_bins))
            for m in range(self.n_mels):
                lo, mid, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
                up = (freqs - lo) / max(mid - lo, 1e-9)
                down = (hi - freqs) / max(hi - mid, 1e-9)
                fb[m] = np.clip(np.minimum(up, down), 0, None)
            self._fb_cache[rate] = fb
        return fb

    def _features(self, payload: bytes) -> np.ndarray:
        samples, rate = decode_wav(payload)
        mono = samples.mean(axis=1)
        n = self.n_fft
        if mono.size < n:
            mono = np.pad(mono, (0, n - mono.size))
        frames = mono[:mono.size - mono.size % n].reshape(-1, n)
        spec = np.abs(np.fft.rfft(frames * np.hanning(n), axis=1)) ** 2
        energies = spec.mean(axis=0) @ self._filterbank(rate).T
        return np.log10(energies + 1e-10)

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from miller_ray.hashing import hash64

        if not self.use_fake:
            rng_vals = np.stack([self._features(p.as_py())
                                 for p in t["payload"]]) if t.num_rows else \
                np.zeros((0, self.n_mels))
        else:
            h = hash64(t["payload"], seed=31)
            rng_vals = np.stack([
                (h >> np.uint64(i * 4)).astype(np.float64) % 1000 / 1000.0
                for i in range(self.n_mels)], axis=1) if t.num_rows else \
                np.zeros((0, self.n_mels))
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(rng_vals.reshape(-1)), self.n_mels)
        return pa.table({"media_id": t["media_id"], "audio_features": feat})


def extract_audio_features(ds, concurrency=(1, 4), batch_size: int = 64,
                           use_fake: bool = True):
    """``use_fake=False`` really decodes PCM WAV payloads (stdlib)."""
    return ds.map_batches(AudioFeatureExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          batch_size=batch_size,
                          fn_constructor_kwargs={"use_fake": use_fake})


def sample_video_frames(ds, every_n: int = 10, concurrency=(1, 4),
                        batch_size: int = 32):
    """Frame sampling is STUBBED at the decode step (no video libs): the
    fake emits one "frame" row per sampled index, deterministic in the
    payload — the flat_map row-explosion shape, small batches for large
    binary payloads, and output schema are the real scale design."""

    class FrameSampler:
        def __init__(self):
            self.every_n = every_n

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            from miller_ray.hashing import hash64

            n_frames = (hash64(t["payload"], seed=37) % np.uint64(100)).astype(np.int64) + 1
            sampled = np.maximum(n_frames // self.every_n, 1)
            media_idx = np.repeat(np.arange(t.num_rows), sampled)
            frame_no = np.concatenate([np.arange(s) * self.every_n for s in sampled]) \
                if t.num_rows else np.zeros(0, dtype=np.int64)
            ids = t["media_id"].take(pa.array(media_idx))
            return pa.table({"media_id": ids,
                             "frame_no": pa.array(frame_no.astype(np.int64))})

    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          batch_size=batch_size)
