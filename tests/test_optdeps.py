"""Optional codec-library hooks (operators/optdeps.py).

Two-sided coverage:

- routing tests run EVERYWHERE: fake modules injected through
  ``optdeps._try_import`` prove the probe order, the mono downmix,
  the None-when-absent contract, and the corrupt->ValueError contract
  without any real codec library;
- real-decode tests are ``importorskip``-marked and only run in a
  codec-equipped environment (soundfile / pyav / Pillow installed);
- operator-level tests pin the documented NotImplementedError when no
  library is importable (skipped automatically where one IS).
"""

from __future__ import annotations

import io
import types

import numpy as np
import pytest

from kafka_streams_plumber_spark.operators import optdeps


def _has(name: str) -> bool:
    return optdeps._try_import(name) is not None


HAS_AUDIO_LIB = any(_has(n) for n in ("soundfile", "av", "librosa"))
HAS_AV = _has("av")
HAS_PIL = _has("PIL.Image")


def _patch_imports(monkeypatch, modules: dict):
    """Route optdeps._try_import through a fixed module table."""
    monkeypatch.setattr(
        optdeps, "_try_import", lambda name: modules.get(name)
    )


# ---------------------------------------------------------------------
# load_audio routing
# ---------------------------------------------------------------------


def test_load_audio_none_when_no_libs(monkeypatch):
    _patch_imports(monkeypatch, {})
    assert optdeps.load_audio(b"\xff\xfb\x90\x00") is None


def test_load_audio_prefers_soundfile_and_downmixes(monkeypatch):
    fake_sf = types.SimpleNamespace(
        read=lambda buf, dtype, always_2d: (
            np.array([[1.0, 0.0], [0.5, 0.5], [-1.0, 0.0]]),
            22050,
        )
    )
    _patch_imports(monkeypatch, {"soundfile": fake_sf})
    x, sr = optdeps.load_audio(b"anything")
    assert sr == 22050
    np.testing.assert_allclose(x, [0.5, 0.5, -0.5])


def test_load_audio_soundfile_failure_without_fallback_is_corrupt(
    monkeypatch,
):
    def boom(buf, dtype, always_2d):
        raise RuntimeError("Format not recognised")

    _patch_imports(monkeypatch, {"soundfile": types.SimpleNamespace(read=boom)})
    with pytest.raises(ValueError):
        optdeps.load_audio(b"not audio at all")


def test_load_audio_librosa_fallback(monkeypatch):
    # soundfile absent, librosa present: librosa path returns mono
    fake_lr = types.SimpleNamespace(
        load=lambda buf, sr, mono: (
            np.array([0.25, -0.25], dtype="float32"),
            8000,
        )
    )
    _patch_imports(monkeypatch, {"librosa": fake_lr})
    x, sr = optdeps.load_audio(b"zz")
    assert sr == 8000
    assert x.dtype == np.float64
    np.testing.assert_allclose(x, [0.25, -0.25])


# ---------------------------------------------------------------------
# video_keyframes routing
# ---------------------------------------------------------------------


def test_video_keyframes_none_without_pyav(monkeypatch):
    _patch_imports(monkeypatch, {})
    assert optdeps.video_keyframes(b"\x00" * 16) is None


class _FakeFrame:
    def __init__(self, pts):
        self.pts = pts

    def to_ndarray(self, format):
        assert format == "rgb24"
        return np.full((2, 2, 3), self.pts, dtype=np.uint8)


class _FakeAvContainer:
    def __init__(self):
        self.streams = [
            types.SimpleNamespace(
                type="video",
                time_base=0.001,  # 1 tick = 1 ms
                codec_context=types.SimpleNamespace(skip_frame=None),
            )
        ]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def decode(self, stream):
        assert stream.codec_context.skip_frame == "NONKEY"
        return [_FakeFrame(0), _FakeFrame(40)]


def test_video_keyframes_decodes_rgb24(monkeypatch):
    fake_av = types.SimpleNamespace(open=lambda buf: _FakeAvContainer())
    _patch_imports(monkeypatch, {"av": fake_av})
    keys = optdeps.video_keyframes(b"webm-ish")
    assert [k["time_ms"] for k in keys] == [0, 40]
    assert keys[1]["payload"] == bytes([40]) * 12  # 2*2*3 rgb24 bytes


def test_video_keyframes_corrupt_raises(monkeypatch):
    def boom(buf):
        raise OSError("Invalid data found when processing input")

    _patch_imports(monkeypatch, {"av": types.SimpleNamespace(open=boom)})
    with pytest.raises(ValueError):
        optdeps.video_keyframes(b"garbage")


# ---------------------------------------------------------------------
# decode_image routing
# ---------------------------------------------------------------------


def test_decode_image_none_without_pillow(monkeypatch):
    _patch_imports(monkeypatch, {})
    assert optdeps.decode_image(b"RIFF....WEBP") is None


class _FakePilImage:
    mode = "RGB"

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def load(self):
        pass

    def __array__(self, dtype=None, copy=None):
        return np.zeros((3, 4, 3), dtype=np.uint8)


def test_decode_image_via_fake_pillow(monkeypatch):
    fake_pil = types.SimpleNamespace(open=lambda buf: _FakePilImage())
    _patch_imports(monkeypatch, {"PIL.Image": fake_pil})
    arr = optdeps.decode_image(b"webp bytes")
    assert arr.shape == (3, 4, 3) and arr.dtype == np.uint8


def test_decode_image_corrupt_raises(monkeypatch):
    def boom(buf):
        raise OSError("cannot identify image file")

    _patch_imports(
        monkeypatch, {"PIL.Image": types.SimpleNamespace(open=boom)}
    )
    with pytest.raises(ValueError):
        optdeps.decode_image(b"???")


# ---------------------------------------------------------------------
# real-library decode (runs only where the optional lib exists)
# ---------------------------------------------------------------------


def test_real_soundfile_roundtrip():
    pytest.importorskip("soundfile")
    from kafka_streams_plumber_spark.operators.codecs import encode_wav

    pcm = (np.sin(np.linspace(0, 40, 800)) * 20000).astype("<i2")
    x, sr = optdeps.load_audio(encode_wav(pcm[:, None], 16000))
    assert sr == 16000 and x.size == 800
    np.testing.assert_allclose(x, pcm / 32768.0, atol=1e-4)


def test_real_pyav_keyframes():
    pytest.importorskip("av")
    # any real container would do; build nothing here — just assert the
    # corrupt contract holds with the real library
    with pytest.raises(ValueError):
        optdeps.video_keyframes(b"\x00" * 64)


def test_real_pillow_decode():
    pil = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    import PIL.Image as Image

    Image.new("RGB", (5, 4), (1, 2, 3)).save(buf, format="WEBP")
    arr = optdeps.decode_image(buf.getvalue())
    assert arr.shape == (4, 5, 3)


# ---------------------------------------------------------------------
# operator-level fallback: documented stub when nothing is importable
# ---------------------------------------------------------------------


@pytest.mark.skipif(HAS_AUDIO_LIB, reason="an audio lib is importable")
def test_audio_operator_raises_without_libs(spark):
    from kafka_streams_plumber_spark.operators.multimodal import (
        extract_audio_features,
    )

    df = spark.createDataFrame(
        [(1, {"mime": "audio/mpeg", "data": b"\xff\xfb\x90\x00" * 32,
              "width": None, "height": None, "duration_ms": 1000})],
        "doc_id long, media struct<mime:string,data:binary,width:int,"
        "height:int,duration_ms:long>",
    )
    with pytest.raises(Exception, match="NotImplementedError|codec library"):
        extract_audio_features(df, fake=None).collect()


@pytest.mark.skipif(HAS_AV, reason="pyav is importable")
def test_video_operator_raises_without_pyav(spark):
    from kafka_streams_plumber_spark.operators.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [(1, {"mime": "video/webm", "data": b"\x1aE\xdf\xa3" + b"\x00" * 64,
              "width": 16, "height": 16, "duration_ms": 2000})],
        "doc_id long, media struct<mime:string,data:binary,width:int,"
        "height:int,duration_ms:long>",
    )
    with pytest.raises(Exception, match="NotImplementedError|pyav"):
        sample_video_frames(df, fake=None).collect()
