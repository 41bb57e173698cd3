"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
ACTOR-POOL ``map_batches`` stages (decoder state initialized once per actor).

Real codecs are wired PER KIND behind availability gates
(:func:`available_decoders`): images decode via PIL when importable, video
via imageio/av when importable, and WAV audio via the stdlib ``wave``
module, which is always present — so the audio ``real=True`` path is live
and tested even in a container with no media libraries.  Kinds whose codec
is absent stay honestly STUBBED: ``real=True`` raises
``NotImplementedError`` at construction naming the missing codecs, and the
default fake decode is a deterministic function of the payload bytes.
Everything Ray-side — schema, batch sizing for large binary payloads, actor
signature, output layout — is identical between the real and fake paths.
"""

from __future__ import annotations

import hashlib
import io
import wave
import zlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic fake media corpus (payloads are seeded random bytes)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
                for sz in rng.integers(256, 4096, size=n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
            "duration_ms": pa.array(
                np.where(kinds == "image", 0, rng.integers(1000, 60000, size=n))
                .astype(np.int32)
            ),
        }
    )


def _pil():
    try:  # pragma: no cover - not present in this container
        from PIL import Image

        return Image
    except ImportError:
        return None


def _video_reader():
    try:  # pragma: no cover - not present in this container
        import imageio.v3 as iio

        return iio
    except ImportError:
        return None


def available_decoders() -> dict[str, bool]:
    """Which media kinds have a REAL codec in this environment.

    ``audio`` is always true: WAV decodes via the stdlib ``wave`` module.
    ``image`` needs PIL, ``video`` needs imageio — both optional installs.
    """
    return {
        "image": _pil() is not None,
        "audio": True,
        "video": _video_reader() is not None,
    }


def _have_real_decoder() -> bool:
    """Back-compat gate: can EVERY kind decode for real here?"""
    return all(available_decoders().values())


def _require_real(kinds: tuple[str, ...], what: str) -> None:
    missing = [k for k in kinds if not available_decoders().get(k, False)]
    if missing:
        raise NotImplementedError(
            f"real {what} for kind(s) {missing} needs "
            f"{'PIL' if 'image' in missing else ''}"
            f"{'/' if len(missing) > 1 else ''}"
            f"{'imageio' if 'video' in missing else ''}"
            " — not available in this environment; pass kinds=(...) to "
            "restrict to decodable kinds, or drop real=True for the "
            "deterministic stub"
        )


def synth_wav(duration_ms: int, freq_hz: float, *, rate: int = 8000,
              amplitude: float = 0.5) -> bytes:
    """A real, deterministic PCM-16 mono WAV payload (stdlib only) — the
    fixture generator for the live audio decode path."""
    n = max(1, int(rate * duration_ms / 1000))
    t = np.arange(n, dtype=np.float64) / rate
    samples = (np.sin(2 * np.pi * freq_hz * t) * amplitude * 32767.0).astype(
        np.int16
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_image_real(payload: bytes, feature_dim: int) -> np.ndarray:
    """PIL path: grayscale, resample to a ``feature_dim``-pixel strip,
    normalize to [0, 1]."""  # pragma: no cover - PIL absent in-sandbox
    img = _pil().open(io.BytesIO(payload)).convert("L")
    strip = img.resize((feature_dim, 1))
    return np.asarray(strip, dtype=np.float64).ravel() / 255.0


def _decode_audio_real(payload: bytes, feature_dim: int) -> np.ndarray:
    """stdlib-wave path: PCM-16 samples -> per-window RMS energy in [0, 1]
    over ``feature_dim`` equal windows."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError(
                f"audio decode expects PCM-16 WAV, got sample width "
                f"{w.getsampwidth()}"
            )
        raw = w.readframes(w.getnframes())
        nch = w.getnchannels()
    samples = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    if samples.size == 0:
        return np.zeros(feature_dim)
    windows = np.array_split(samples, feature_dim)
    return np.array(
        [np.sqrt(np.mean(np.square(win / 32768.0))) if win.size else 0.0
         for win in windows]
    )


def _decode_video_real(payload: bytes, feature_dim: int) -> np.ndarray:
    """imageio path: mean frame luminance resampled to ``feature_dim``
    values."""  # pragma: no cover - imageio absent in-sandbox
    frames = _video_reader().imread(payload, index=None)
    lum = np.asarray(frames, dtype=np.float64).mean(axis=tuple(
        range(1, np.asarray(frames).ndim)
    ))
    idx = (np.arange(feature_dim) * lum.size // feature_dim) % lum.size
    return lum[idx] / 255.0


_REAL_DECODERS = {
    "image": _decode_image_real,
    "audio": _decode_audio_real,
    "video": _decode_video_real,
}


class DecodeMedia:
    """Actor-pool stage: payload bytes -> fixed-dim feature vector.

    ``feature_dim`` floats per row.  ``real=True`` uses the live per-kind
    codecs (PIL images, stdlib-wave WAV audio, imageio video) and raises
    ``NotImplementedError`` AT CONSTRUCTION for any kind in ``kinds`` whose
    codec is absent (:func:`available_decoders`); the default is the
    deterministic fake (crc of payload windows), stable across
    runs/partitionings.  Use small ``batch_size`` when payloads are large:
    batch bytes = batch_size x payload size must fit the worker heap.
    """

    def __init__(
        self,
        feature_dim: int = 16,
        real: bool = False,
        kinds: tuple[str, ...] = ("image", "audio", "video"),
    ) -> None:
        if real:
            _require_real(kinds, "media decoding")
        self.real = real
        self.kinds = kinds
        self.feature_dim = feature_dim

    def _decode_payload(self, payload: bytes, kind: str) -> np.ndarray:
        if self.real:
            if kind not in self.kinds:
                raise ValueError(
                    f"kind {kind!r} in batch but not in the decoder's "
                    f"declared kinds {self.kinds}"
                )
            return _REAL_DECODERS[kind](payload, self.feature_dim)
        # deterministic fake: crc of dim windows, scaled to [0, 1)
        step = max(1, len(payload) // self.feature_dim)
        out = np.empty(self.feature_dim, dtype=np.float64)
        for i in range(self.feature_dim):
            chunk = payload[i * step : (i + 1) * step] or b"\0"
            out[i] = (zlib.crc32(chunk) % 10_000) / 10_000.0
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode_payload(p.as_py(), k)
            for p, k in zip(batch["payload"], batch["kind"].to_pylist())
        ]
        flat = np.concatenate(feats) if feats else np.empty(0)
        off = np.arange(
            0, (len(feats) + 1) * self.feature_dim, self.feature_dim, dtype=np.int32
        )
        digest = [
            hashlib.blake2b(p.as_py(), digest_size=8).hexdigest()
            for p in batch["payload"]
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "features": pa.ListArray.from_arrays(pa.array(off), pa.array(flat)),
                "payload_digest": pa.array(digest, type=pa.string()),
            }
        )


def decode_features(
    media_ds: ray.data.Dataset,
    *,
    feature_dim: int = 16,
    real: bool = False,
    kinds: tuple[str, ...] = ("image", "audio", "video"),
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The decode stage wiring: small batches (binary payloads), actor pool."""
    if real:
        # fail on the driver, not N times inside actors
        _require_real(kinds, "media decoding")
    # (1, N) autoscaling: a fixed pool >= the cluster's CPUs would pin
    # every slot with idle actors and starve the upstream read
    return media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={
            "feature_dim": feature_dim, "real": real, "kinds": kinds
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class ResizeImages:
    """Actor-pool stage: image payload -> payload resized to target dims.

    ``real=True`` decodes with PIL, resizes, and re-encodes as PNG (gated on
    PIL being importable, checked at construction).  The default fake
    deterministically re-samples payload bytes to a size proportional to the
    target area; the metadata columns are updated identically either way, so
    schema/flow are production-shaped in both modes."""

    def __init__(self, width: int, height: int, real: bool = False) -> None:
        if real:
            _require_real(("image",), "image resize")
        self.real = real
        self.width = int(width)
        self.height = int(height)

    def _resize_real(self, payload: bytes) -> bytes:
        """PIL decode -> resize -> PNG re-encode."""  # pragma: no cover
        img = _pil().open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((self.width, self.height)).save(out, format="PNG")
        return out.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for p, kind in zip(batch["payload"], batch["kind"].to_pylist()):
            raw = np.frombuffer(p.as_py(), dtype=np.uint8)
            if kind != "image" or raw.size == 0:
                out_payloads.append(raw.tobytes())
                continue
            if self.real:  # pragma: no cover - PIL absent in-sandbox
                out_payloads.append(self._resize_real(p.as_py()))
                continue
            target = max(16, (self.width * self.height) // 256)
            idx = (np.arange(target) * raw.size // target) % raw.size
            out_payloads.append(raw[idx].tobytes())
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "payload": pa.array(out_payloads, type=pa.binary()),
                "width": pa.array(
                    np.where(
                        np.array(batch["kind"].to_pylist()) == "image",
                        self.width,
                        batch["width"].to_numpy(),
                    ).astype(np.int32)
                ),
                "height": pa.array(
                    np.where(
                        np.array(batch["kind"].to_pylist()) == "image",
                        self.height,
                        batch["height"].to_numpy(),
                    ).astype(np.int32)
                ),
                "duration_ms": batch["duration_ms"],
            }
        )


class SampleFrames:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME
    (flat_map-shaped: output rows != input rows).

    ``real=True`` is gated on a video codec (imageio) being importable —
    checked at construction.  The default fake extracts a deterministic
    byte slice of the payload at each sampled timestamp; the sampling
    schedule (every ``every_ms``) and the exploded output layout are
    identical in both modes."""

    def __init__(self, every_ms: int = 1000, real: bool = False) -> None:
        if real:
            _require_real(("video",), "frame sampling")
        self.real = real
        self.every_ms = max(1, int(every_ms))

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_ts, frames = [], [], []
        for mid, kind, p, dur in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"],
            batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or dur <= 0:
                continue
            raw = p.as_py()
            if self.real:  # pragma: no cover - imageio absent in-sandbox
                decoded = _video_reader().imread(raw, index=None)
                n_frames = max(1, len(decoded))
                for ts in range(0, dur, self.every_ms):
                    fi = min(n_frames - 1, (ts * n_frames) // dur)
                    frames.append(
                        np.ascontiguousarray(decoded[fi]).tobytes()
                    )
                    media_ids.append(mid)
                    frame_ts.append(ts)
                continue
            for ts in range(0, dur, self.every_ms):
                a = (ts * max(1, len(raw))) // max(1, dur)
                frames.append(raw[a : a + 64] or b"\0")
                media_ids.append(mid)
                frame_ts.append(ts)
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.int64()),
                "frame_ts_ms": pa.array(frame_ts, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def resize_images(
    media_ds: ray.data.Dataset, width: int, height: int, *,
    real: bool = False, concurrency: int = 2, batch_size: int = 64,
) -> ray.data.Dataset:
    if real:
        _require_real(("image",), "image resize")
    return media_ds.map_batches(
        ResizeImages,
        fn_constructor_args=(width, height, real),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def sample_frames(
    media_ds: ray.data.Dataset, every_ms: int = 1000, *,
    real: bool = False, concurrency: int = 2, batch_size: int = 32,
) -> ray.data.Dataset:
    """Small batches: frame explosion multiplies row count and payload
    bytes; batch bytes x concurrency must fit the worker heap."""
    if real:
        _require_real(("video",), "frame sampling")
    return media_ds.map_batches(
        SampleFrames,
        fn_constructor_args=(every_ms, real),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def media_neardup(
    media_ds: ray.data.Dataset,
    *,
    threshold: float = 0.999,
    feature_dim: int = 16,
    nlist: int = 8,
    assign_k: int = 4,
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Near-duplicate media by decoded-feature cosine similarity — the
    composed pipeline: actor-pool decode/feature-extract (stubbed codec,
    real wiring) -> spherical-IVF bucketed cosine pairs
    (``dedup.embedding_cosine_pairs``).  Identical payloads decode to
    identical features, so exact duplicates surface at cosine 1.0
    regardless of the decoder stub.  Output: (media_a, media_b, cosine).

    Recall note: the IVF bucketing can miss a pair whose two vectors share
    none of their ``assign_k`` nearest clusters — recall 1.0 is asserted
    only at test scale.  Raise ``assign_k`` (towards ``nlist``), or pass
    ``method="exact"`` through to ``embedding_cosine_pairs`` via a direct
    call, when guaranteed recall matters more than O(N^2) compute."""
    from .dedup import embedding_cosine_pairs

    feats = decode_features(
        media_ds,
        feature_dim=feature_dim,
        concurrency=concurrency,
        batch_size=batch_size,
    )
    emb = feats.map_batches(
        lambda b: pa.table(
            {"vec_id": b["media_id"], "embedding": b["features"]}
        ),
        batch_format="pyarrow",
    )
    pairs = embedding_cosine_pairs(
        emb, threshold, nlist=nlist, assign_k=assign_k
    )
    return pairs.map_batches(
        lambda b: b.rename_columns(
            ["media_a" if c == "vec_a" else "media_b" if c == "vec_b" else c
             for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
