"""Optional codec-library hooks for the multimodal operators.

The pure-stdlib codecs (operators/codecs.py) decode PNG/JPEG/GIF/BMP,
WAV PCM, and demux MP4 with nothing beyond zlib/struct/numpy. The
remaining media slice — MP3/AAC entropy decode, AVC pixel decode, and
exotic image containers (WebP, TIFF, ...) — genuinely needs a codec
library. This module is the seam: each hook probes the optional
libraries at call time and

- returns decoded data when one of them is importable,
- returns ``None`` when NO optional library is present (the caller
  then raises its documented ``NotImplementedError``), and
- raises ``ValueError`` when a library IS present but the payload is
  corrupt (the caller drops the item, same as every stdlib codec).

Nothing here is imported at module load of the operators; a container
without the libraries behaves exactly as before, and a codec-equipped
deployment gets real decode with zero configuration. Tests exercise
both sides: skip-marked real-decode tests (run only where the library
exists) plus always-on routing tests that monkeypatch fake modules.

Probe order for audio: soundfile (libsndfile: wav/flac/ogg, and mp3 on
libsndfile >= 1.1), then pyav (ffmpeg: mp3/aac/anything), then librosa
(which itself wraps soundfile/audioread). Video and exotic images:
pyav and Pillow respectively.
"""

from __future__ import annotations

import importlib
import io
from typing import Any


def _try_import(name: str) -> Any:
    """Import an optional module; any failure (absent, broken install,
    missing native lib) counts as 'not available'."""
    try:
        return importlib.import_module(name)
    except Exception:
        return None


# -------------------------------------------------------------------------
# audio
# -------------------------------------------------------------------------


def load_audio(data: bytes) -> tuple[Any, int] | None:
    """Decode compressed audio to ``(mono float64 ndarray in [-1, 1],
    sample_rate)``.

    Returns None when no optional audio library is importable; raises
    ValueError when at least one library was importable but none could
    decode the payload (corrupt / unsupported codec build).
    """
    import numpy as np

    tried = False

    sf = _try_import("soundfile")
    if sf is not None:
        tried = True
        try:
            x, sr = sf.read(io.BytesIO(data), dtype="float64", always_2d=True)
            return x.mean(axis=1), int(sr)
        except Exception:
            pass  # libsndfile build may lack this codec; try the next lib

    av = _try_import("av")
    if av is not None:
        tried = True
        try:
            with av.open(io.BytesIO(data)) as container:
                stream = next(
                    (s for s in container.streams if s.type == "audio"), None
                )
                if stream is None:
                    raise ValueError("no audio stream")
                sr = int(stream.codec_context.sample_rate or 0)
                chunks = []
                for frame in container.decode(stream):
                    a = frame.to_ndarray()
                    # planar formats are (channels, n); packed mono is
                    # (1, n*channels) — downmix over the channel axis
                    if a.ndim == 2:
                        a = a.mean(axis=0)
                    if a.dtype.kind == "i":
                        a = a.astype("float64") / float(
                            np.iinfo(a.dtype).max + 1
                        )
                    else:
                        a = a.astype("float64")
                    chunks.append(a)
                if not chunks or not sr:
                    raise ValueError("no decodable audio frames")
                return np.concatenate(chunks), sr
        except ValueError:
            raise
        except Exception as exc:
            raise ValueError(f"corrupt compressed audio: {exc}") from exc

    lr = _try_import("librosa")
    if lr is not None:
        tried = True
        try:
            x, sr = lr.load(io.BytesIO(data), sr=None, mono=True)
            return x.astype("float64"), int(sr)
        except Exception as exc:
            raise ValueError(f"corrupt compressed audio: {exc}") from exc

    if tried:
        # soundfile was importable but could not decode, and no
        # fallback library exists: treat as undecodable payload
        raise ValueError("no importable library could decode this audio")
    return None


# -------------------------------------------------------------------------
# video
# -------------------------------------------------------------------------


def video_keyframes(data: bytes) -> list[dict] | None:
    """Decode a non-MP4 encoded video's keyframes to RGB pixels.

    Returns ``[{"time_ms": int, "payload": bytes}, ...]`` (payload is
    the rgb24 buffer of the decoded keyframe, h*w*3 bytes) ordered by
    time; None when pyav is not importable; ValueError on corrupt
    input. Matches the shape of codecs.mp4_sync_samples so the
    sample_frames caller treats both paths identically.
    """
    av = _try_import("av")
    if av is None:
        return None
    try:
        with av.open(io.BytesIO(data)) as container:
            stream = next(
                (s for s in container.streams if s.type == "video"), None
            )
            if stream is None:
                raise ValueError("no video stream")
            # decode keyframes only — the demuxer skips non-key packets
            stream.codec_context.skip_frame = "NONKEY"
            tb = float(stream.time_base) if stream.time_base else 0.0
            out = []
            for frame in container.decode(stream):
                t_ms = (
                    int(frame.pts * tb * 1000.0)
                    if frame.pts is not None and tb
                    else len(out)
                )
                out.append(
                    {
                        "time_ms": t_ms,
                        "payload": frame.to_ndarray(format="rgb24").tobytes(),
                    }
                )
            if not out:
                raise ValueError("no decodable keyframes")
            return out
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"corrupt encoded video: {exc}") from exc


# -------------------------------------------------------------------------
# images beyond the stdlib codecs
# -------------------------------------------------------------------------


def decode_image(data: bytes) -> Any | None:
    """Decode an image container the stdlib codecs don't cover (WebP,
    TIFF, ...) to an ``(h, w, c) uint8`` ndarray via Pillow.

    Returns None when Pillow is not importable; ValueError on corrupt
    input.
    """
    pil = _try_import("PIL.Image")
    if pil is None:
        return None
    import numpy as np

    try:
        with pil.open(io.BytesIO(data)) as im:
            im.load()
            if im.mode not in ("L", "LA", "RGB", "RGBA"):
                im = im.convert("RGBA" if "A" in im.mode else "RGB")
            arr = np.asarray(im, dtype=np.uint8)
    except Exception as exc:
        raise ValueError(f"corrupt image: {exc}") from exc
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr
