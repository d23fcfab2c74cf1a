"""Multimodal stage tests: REAL codec-free decode (PCM WAV via stdlib
wave, netpbm P6, uncompressed 24-bit BMP) plus the deterministic-fake
plumbing path, end-to-end through the Ray actor-pool stages."""

import numpy as np
import pytest

from miller_ray.stages import multimodal as mm


@pytest.fixture
def rd(ray_session):
    import ray.data
    return ray.data


def _unpack(tbl, col):
    arr = tbl[col].combine_chunks()
    return np.array(arr.flatten()).reshape(tbl.num_rows, -1)


def test_decode_netpbm_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    ppm = b"P6\n# a comment\n9 5\n255\n" + img.tobytes()
    assert (mm.decode_netpbm(ppm) == img).all()
    gray = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    pgm = b"P5 6 4 255\n" + gray.tobytes()
    assert (mm.decode_netpbm(pgm) == gray).all()


def test_decode_bmp_roundtrip():
    t = mm.make_real_media_table(12)
    for payload, ty, w, h in zip(t["payload"], t["media_type"],
                                 t["width"], t["height"]):
        if ty.as_py() != "image/bmp":
            continue
        img = mm.decode_bmp(payload.as_py())
        assert img.shape == (h.as_py(), w.as_py(), 3)
        assert img.dtype == np.uint8


def test_decode_wav_sine_tone():
    t = mm.make_real_media_table(3)
    payload = [p for p, ty in zip(t["payload"], t["media_type"])
               if ty.as_py() == "audio/wav"][0].as_py()
    samples, rate = mm.decode_wav(payload)
    assert rate == 16000 and samples.shape == (800, 1)
    # 0.5-amplitude sine -> RMS = 0.5/sqrt(2)
    assert abs(float(np.sqrt((samples ** 2).mean())) - 0.5 / np.sqrt(2)) < 0.01


def test_audio_features_real_band_peak():
    """The mel band containing the tone's frequency should carry the
    peak log-energy."""
    import io
    import wave

    rate, freq = 16000, 1000.0
    t = np.arange(rate) / rate
    pcm = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1); wv.setsampwidth(2); wv.setframerate(rate)
        wv.writeframes(pcm.tobytes())
    ex = mm.AudioFeatureExtractor(use_fake=False, n_mels=16)
    feats = ex._features(buf.getvalue())
    assert feats.shape == (16,)
    # locate the band whose filter peaks nearest 1 kHz
    fb = ex._filterbank(rate)
    freqs = np.linspace(0, rate / 2, fb.shape[1])
    centers = freqs[fb.argmax(axis=1)]
    assert int(np.argmax(feats)) == int(np.argmin(np.abs(centers - freq)))


def test_real_decode_stages_end_to_end(rd):
    """Both actor-pool stages run the use_fake=False path over a mixed
    real-media Dataset and emit finite fixed-size features."""
    t = mm.make_real_media_table(30)
    media = rd.from_arrow(t)
    img_types = {"image/x-portable-pixmap", "image/bmp"}
    imgs = media.filter(lambda r: r["media_type"] in img_types)
    auds = media.filter(lambda r: r["media_type"] == "audio/wav")

    fi = mm.extract_image_features(imgs, concurrency=(1, 2), use_fake=False)
    fa = mm.extract_audio_features(auds, concurrency=(1, 2), use_fake=False)
    ti, ta = fi.to_arrow_refs(), fa.to_arrow_refs()
    import pyarrow as pa
    import ray
    ti = pa.concat_tables([ray.get(r) for r in ti])
    ta = pa.concat_tables([ray.get(r) for r in ta])
    assert ti.num_rows == 20 and ta.num_rows == 10
    assert np.isfinite(_unpack(ti, "features")).all()
    assert np.isfinite(_unpack(ta, "audio_features")).all()
    # real features distinguish images: not all rows identical
    f = _unpack(ti, "features")
    assert np.ptp(f, axis=0).max() > 0


def test_fake_path_still_deterministic(rd):
    media = rd.from_arrow(mm.make_fake_media_table(50))
    f1 = _unpack(mm.extract_image_features(media).take_batch(
        50, batch_format="pyarrow"), "features")
    f2 = _unpack(mm.extract_image_features(media).take_batch(
        50, batch_format="pyarrow"), "features")
    assert (f1 == f2).all()


def test_compressed_format_raises():
    ex = mm.ImageFeatureExtractor(use_fake=False)
    with pytest.raises(NotImplementedError):
        ex._decode(b"\x89PNG\r\n\x1a\n....")
