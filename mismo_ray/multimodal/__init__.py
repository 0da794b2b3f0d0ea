"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool map_batches stages.

Not in the reference (mismo is text/tabular only); part of the 100 TB
training-data surface (task brief). Uncompressed formats decode for REAL:
``codecs.decode_ppm`` / ``decode_wav`` (pure-numpy netpbm P5/P6 and
RIFF/WAVE PCM parsers, round-trip tested) plug straight into the
``decoder=`` hooks, so the image/audio stages run end-to-end on real
payloads. Compressed codecs (JPEG/PNG/MP3/H.264) need libraries NOT in
this container and remain STUBS behind the same hooks (a deterministic
fake is provided for tests); everything Ray-side — schema, batch sizing,
actor signature, output layout — is real and tested either way.

Layout convention: a media table is
    (record_id:int64, payload:binary, media_type:string, meta:struct/json)
and each stage appends typed columns, never mutates payload in place.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data

from mismo_ray._util import hash64


class DecodeError(RuntimeError):
    pass


def _missing_decoder(kind: str):
    def decoder(payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"No {kind} decoder available in this environment: install a "
            f"decode library and pass decoder=... (the Ray plumbing around "
            f"this stage is fully functional)"
        )

    return decoder


def pil_decoder():
    """Real-codec seam: returns a ``bytes -> np.ndarray(H, W, 3)`` decoder
    backed by Pillow (optional dep, not installed in this environment).
    Call inside an actor's ``__init__`` (``ImageFeaturizer(decoder=
    pil_decoder())`` constructed per actor via fn_constructor_kwargs) so
    the import happens once per actor."""
    import io

    from PIL import Image  # optional dep

    def decode(payload: bytes) -> np.ndarray:
        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)

    return decode


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes -> (8, 8, 3) uint8 'image'
    derived from a seeded hash of the payload. Lets tests exercise the whole
    actor-pool pipeline without a real codec."""
    seed = int(hash64([payload])[0] & np.uint64(0x7FFFFFFF))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


class ImageFeaturizer:
    """Actor-pool stage: decode image payloads and emit fixed-size feature
    vectors (channel means + a coarse 2x2 luminance grid).

    Use as ``ds.map_batches(ImageFeaturizer, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B, num_cpus=c)`` — decoder setup happens once
    per actor in __init__ (SURVEY §2.4 actor-pool pattern). Batch sizes must
    stay small for large payloads (wide-binary-row hazard, SURVEY §7.5).
    """

    N_FEATURES = 7

    def __init__(
        self,
        decoder: Callable[[bytes], np.ndarray] | None = None,
        *,
        payload_column: str = "payload",
        on_error: str = "null",
    ):
        self.decode = decoder or _missing_decoder("image")
        self.payload_column = payload_column
        if on_error not in ("null", "raise"):
            raise ValueError("on_error must be 'null' or 'raise'")
        self.on_error = on_error

    def _features(self, img: np.ndarray) -> list[float]:
        f = img.astype(np.float64)
        means = f.mean(axis=(0, 1)).tolist()  # per-channel
        lum = f.mean(axis=2)
        h, w = lum.shape
        grid = [
            float(lum[: h // 2, : w // 2].mean()),
            float(lum[: h // 2, w // 2 :].mean()),
            float(lum[h // 2 :, : w // 2].mean()),
            float(lum[h // 2 :, w // 2 :].mean()),
        ]
        return [*means, *grid]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_column].to_pylist():
            if payload is None:
                out.append(None)
                continue
            try:
                out.append(self._features(self.decode(payload)))
            except NotImplementedError:
                raise
            except Exception:
                if self.on_error == "raise":
                    raise
                out.append(None)
        return batch.append_column(
            "image_features",
            pa.array(out, type=pa.list_(pa.float64(), self.N_FEATURES)),
        )


def featurize_images(
    ds: ray.data.Dataset,
    *,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    payload_column: str = "payload",
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 64,
    num_cpus: float = 1,
) -> ray.data.Dataset:
    """Actor-pool image featurization; small batch_size by default because
    payload rows are wide."""
    from mismo_ray._pool import clamp_pool

    concurrency = clamp_pool(concurrency, num_cpus=num_cpus)
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={
            "decoder": decoder,
            "payload_column": payload_column,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W, C) array — pure numpy (the resize
    KERNEL needs no codec; only decode/encode do)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(height) * h) // height, h - 1)
    cols = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[rows[:, None], cols[None, :]]


class ImageResizer:
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-encode.

    The resize itself is a real numpy kernel; ``decoder(bytes)->ndarray`` and
    ``encoder(ndarray)->bytes`` are the pluggable codec hooks (stubbed when
    absent). Output column ``resized_payload`` (binary), null on decode
    failure with on_error="null".
    """

    def __init__(
        self,
        *,
        height: int,
        width: int,
        decoder: Callable[[bytes], np.ndarray] | None = None,
        encoder: Callable[[np.ndarray], bytes] | None = None,
        payload_column: str = "payload",
        on_error: str = "null",
    ):
        self.height = height
        self.width = width
        self.decode = decoder or _missing_decoder("image")
        self.encode = encoder or (lambda a: a.tobytes())
        self.payload_column = payload_column
        self.on_error = on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_column].to_pylist():
            if payload is None:
                out.append(None)
                continue
            try:
                img = self.decode(payload)
                out.append(self.encode(resize_nearest(img, self.height, self.width)))
            except NotImplementedError:
                raise
            except Exception:
                if self.on_error == "raise":
                    raise
                out.append(None)
        return batch.append_column(
            "resized_payload", pa.array(out, type=pa.binary())
        )


def fake_audio_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in: bytes -> 1-second float32 'waveform' (1 kHz)
    derived from a seeded hash."""
    seed = int(hash64([payload])[0] & np.uint64(0x7FFFFFFF))
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(1000) * 0.1).astype(np.float32)


class AudioFeaturizer:
    """Actor-pool stage: decode audio payloads -> per-clip features (RMS
    energy, zero-crossing rate, peak, duration in samples). The feature
    kernel is real numpy; the codec is the pluggable stub."""

    N_FEATURES = 4

    def __init__(
        self,
        decoder: Callable[[bytes], np.ndarray] | None = None,
        *,
        payload_column: str = "payload",
        on_error: str = "null",
    ):
        self.decode = decoder or _missing_decoder("audio")
        self.payload_column = payload_column
        self.on_error = on_error

    def _features(self, wave: np.ndarray) -> list[float]:
        w = np.asarray(wave, dtype=np.float64)
        if not len(w):
            return [0.0, 0.0, 0.0, 0.0]
        rms = float(np.sqrt((w**2).mean()))
        zcr = float((np.signbit(w[1:]) != np.signbit(w[:-1])).mean())
        return [rms, zcr, float(np.abs(w).max()), float(len(w))]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.payload_column].to_pylist():
            if payload is None:
                out.append(None)
                continue
            try:
                out.append(self._features(self.decode(payload)))
            except NotImplementedError:
                raise
            except Exception:
                if self.on_error == "raise":
                    raise
                out.append(None)
        return batch.append_column(
            "audio_features",
            pa.array(out, type=pa.list_(pa.float64(), self.N_FEATURES)),
        )


def sample_frames(
    ds: ray.data.Dataset,
    *,
    n_frames: int,
    frame_decoder: Callable[[bytes, int], bytes] | None = None,
    payload_column: str = "payload",
) -> ray.data.Dataset:
    """Video frame-sampling plumbing: one input row -> up to n_frames output
    rows (record_id, frame_index, frame_payload). The frame extraction itself
    is the pluggable ``frame_decoder(payload, index) -> bytes`` (stubbed)."""
    if frame_decoder is None:
        missing = _missing_decoder("video")

        def frame_decoder(payload: bytes, index: int) -> bytes:  # noqa: F811
            return missing(payload)

    def fn(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for rid, payload in zip(
            t["record_id"].to_pylist(), t[payload_column].to_pylist()
        ):
            if payload is None:
                continue
            for i in range(n_frames):
                ids.append(rid)
                idxs.append(i)
                frames.append(frame_decoder(payload, i))
        return pa.table(
            {
                "record_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(idxs, type=pa.int64()),
                "frame_payload": pa.array(frames, type=pa.binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=16)
