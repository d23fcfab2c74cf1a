"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — each raises NotImplementedError unless the optional
dependency imports, or uses the deterministic fake when
``use_fake=True``); everything Ray-side is real and tested: schema,
actor-pool signature, batch sizing for large binary payloads, output
layout.

Scale notes: binary payloads make rows wide — size ``batch_size`` small
(64-256) so batch x concurrency fits worker heaps, and keep these
stages in ``batch_format="pyarrow"`` (binary columns round-trip poorly
through pandas object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from miller_ray.hashing import hash64

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
    derived from the payload hash (lets pipelines and tests run without
    codecs)."""

    def __init__(self, use_fake: bool = True, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.use_fake = use_fake
        if not use_fake:
            try:
                import PIL.Image  # noqa: F401
                self._pil = PIL.Image
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "image decode requires Pillow, not present in this container; "
                    "construct with use_fake=True for the deterministic fake") from e

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.use_fake:  # pragma: no cover
            raise NotImplementedError("real decode path requires image codecs")
        h = hash64(t["payload"])
        feats = np.stack([
            (hash64(h, seed=i).astype(np.float64) / 2**64) for i in range(self.feature_dim)
        ], axis=1)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.feature_dim)
        return pa.table({"media_id": t["media_id"], "features": feat_col})


def extract_image_features(ds, concurrency=(1, 4), batch_size: int = 128):
    """Feature extraction over a media table — small batches (binary
    payloads), actor pool, Arrow in/out."""
    return ds.map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          batch_size=batch_size)


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


class AudioFeatureExtractor:
    """Audio decode is STUBBED (no audio libs in this container): the
    real pipeline would libsndfile/ffmpeg-decode ``payload`` then compute
    e.g. log-mel energies. The Ray-side plumbing (schema, actor pool,
    batch sizing) is real; the fake features are deterministic in the
    payload bytes so tests are stable."""

    def __init__(self, use_fake: bool = True, n_mels: int = 16):
        if not use_fake:
            raise NotImplementedError("audio decode requires soundfile/ffmpeg "
                                      "(not in this container)")
        self.n_mels = n_mels

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        from miller_ray.hashing import hash64

        h = hash64(t["payload"], seed=31)
        rng_vals = np.stack([
            (h >> np.uint64(i * 4)).astype(np.float64) % 1000 / 1000.0
            for i in range(self.n_mels)], axis=1)
        feat = pa.FixedSizeListArray.from_arrays(
            pa.array(rng_vals.reshape(-1)), self.n_mels)
        return pa.table({"media_id": t["media_id"], "audio_features": feat})


def extract_audio_features(ds, concurrency=(1, 4), batch_size: int = 64):
    return ds.map_batches(AudioFeatureExtractor, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          batch_size=batch_size)


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
