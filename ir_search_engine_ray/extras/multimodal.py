"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
ACTOR-POOL ``map_batches`` stages (decoder state initialized once per actor).

The sandbox has no image/audio libraries, so the actual codec work is STUBBED
(clearly marked): ``DecodeMedia`` raises ``NotImplementedError`` when asked
for a real decode and otherwise produces a deterministic fake decode derived
from the payload bytes.  Everything Ray-side — schema, batch sizing for large
binary payloads, actor signature, output layout — is real and tested, so
swapping in PIL/librosa later only touches ``_decode_payload``.
"""

from __future__ import annotations

import hashlib
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


def _have_real_decoder() -> bool:
    try:  # pragma: no cover - not present in this container
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class DecodeMedia:
    """Actor-pool stage: payload bytes -> fixed-dim feature vector.

    ``feature_dim`` floats per row; real decoding is NotImplemented in this
    container (STUB) — the deterministic fake hashes payload windows so
    results are stable across runs/partitionings.  Use small ``batch_size``
    when payloads are large: batch bytes = batch_size x payload size must fit
    the worker heap.
    """

    def __init__(self, feature_dim: int = 16, real: bool = False) -> None:
        if real and not _have_real_decoder():
            raise NotImplementedError(
                "real media decoding requires PIL/librosa, not available here"
            )
        self.real = real
        self.feature_dim = feature_dim

    def _decode_payload(self, payload: bytes, kind: str) -> np.ndarray:
        if self.real:  # pragma: no cover
            raise NotImplementedError("real decode path is stubbed in-sandbox")
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
    concurrency: int = 2,
    batch_size: int = 64,
) -> ray.data.Dataset:
    """The decode stage wiring: small batches (binary payloads), actor pool."""
    return media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeImages:
    """Actor-pool stage: image payload -> payload "resized" to target dims.

    STUB codec (no PIL in-sandbox): the fake deterministically re-samples
    payload bytes to a size proportional to the target area, and the
    metadata columns are updated for real — so schema/flow are production-
    shaped and only the pixel work is fake."""

    def __init__(self, width: int, height: int, real: bool = False) -> None:
        if real and not _have_real_decoder():
            raise NotImplementedError("real resize requires PIL")
        self.width = int(width)
        self.height = int(height)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        for p, kind in zip(batch["payload"], batch["kind"].to_pylist()):
            raw = np.frombuffer(p.as_py(), dtype=np.uint8)
            if kind != "image" or raw.size == 0:
                out_payloads.append(raw.tobytes())
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

    Frame extraction is STUBBED (no decoder in-sandbox): each "frame" is a
    deterministic byte slice of the payload at the sampled timestamp; the
    sampling schedule (every ``every_ms``) and the exploded output layout
    are real."""

    def __init__(self, every_ms: int = 1000, real: bool = False) -> None:
        if real and not _have_real_decoder():
            raise NotImplementedError("real frame sampling requires a video codec")
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
    concurrency: int = 2, batch_size: int = 64,
) -> ray.data.Dataset:
    return media_ds.map_batches(
        ResizeImages,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    media_ds: ray.data.Dataset, every_ms: int = 1000, *,
    concurrency: int = 2, batch_size: int = 32,
) -> ray.data.Dataset:
    """Small batches: frame explosion multiplies row count and payload
    bytes; batch bytes x concurrency must fit the worker heap."""
    return media_ds.map_batches(
        SampleFrames,
        fn_constructor_args=(every_ms,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
