"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The Ray-side plumbing is real and tested — schema contract, actor signature,
batch sizing, output layout. The codec work itself is STUBBED: the
image/audio libraries are not in this container, so each decoder tries its
import in ``__init__`` (once per actor) and either uses the real library or —
only when ``allow_fake=True`` — a deterministic fake derived from the payload
bytes. With no library and no fake, the stage raises NotImplementedError at
construction, never mid-stream.

Batch-size guidance for binary payloads: keep ``batch_size`` small (rows are
megabytes, not bytes) and let ``DataContext.target_max_block_size`` bound the
block memory; a pool of N decode actors with num_cpus=1 each overlaps decode
with the surrounding read/write stages.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

#: schema contract for a multimodal corpus shard
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _digest_floats(payload: bytes, n: int) -> np.ndarray:
    """Deterministic fake feature vector from the payload bytes (sha256
    counter mode) — stable across runs/processes."""
    out = np.empty(n, dtype=np.float32)
    i, filled = 0, 0
    while filled < n:
        d = hashlib.sha256(payload + i.to_bytes(4, "little")).digest()
        block = np.frombuffer(d, dtype=np.uint8).astype(np.float32) / 255.0
        take = min(n - filled, block.size)
        out[filled : filled + take] = block[:take]
        filled += take
        i += 1
    return out


class DecodeImage:
    """Actor-pool stage: binary payload -> (media_id, width, height,
    features[dim]). Real path uses PIL when importable; fake path derives
    deterministic dimensions/features from the bytes."""

    def __init__(self, feature_dim: int = 64, allow_fake: bool = True):
        self.feature_dim = feature_dim
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None
            if not allow_fake:
                raise NotImplementedError(
                    "image decoding requires PIL (not in this container); "
                    "pass allow_fake=True for the deterministic stub"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths, heights, feats = [], [], []
        for p in payloads:
            p = p or b""
            if self._pil is not None:
                import io

                with self._pil.open(io.BytesIO(p)) as img:
                    w, h = img.size
                    arr = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float32)
                    f = arr.reshape(-1) / 255.0
                    f = np.resize(f, self.feature_dim)
            else:
                d = hashlib.sha256(p).digest()
                w, h = 64 + d[0] % 192, 64 + d[1] % 192
                f = _digest_floats(p, self.feature_dim)
            widths.append(w)
            heights.append(h)
            feats.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class ResizeImage:
    """Actor-pool stage: payload -> resized payload (stub re-emits a
    deterministic transform of the bytes when PIL is absent)."""

    def __init__(self, width: int = 224, height: int = 224, allow_fake: bool = True):
        self.width = width
        self.height = height
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None
            if not allow_fake:
                raise NotImplementedError("resize requires PIL; allow_fake=True for stub")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = []
        for p in payloads:
            p = p or b""
            if self._pil is not None:
                import io

                with self._pil.open(io.BytesIO(p)) as img:
                    buf = io.BytesIO()
                    img.resize((self.width, self.height)).save(buf, format="PNG")
                    out.append(buf.getvalue())
            else:
                out.append(hashlib.sha256(b"resize" + p).digest())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([self.width] * len(out), pa.int32()),
                "height": pa.array([self.height] * len(out), pa.int32()),
            }
        )


class SampleFrames:
    """Actor-pool stage for video: payload -> `n_frames` evenly-spaced frame
    payloads (stub: deterministic slices of the byte stream). Output is
    exploded: one row per sampled frame."""

    def __init__(self, n_frames: int = 4, allow_fake: bool = True):
        self.n_frames = n_frames
        self._codec = None  # no video lib in this container
        if not allow_fake:
            raise NotImplementedError("video decoding requires a codec library")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_ids, out_idx, out_frames = [], [], []
        for mid, p in zip(ids, payloads):
            p = p or b""
            for j in range(self.n_frames):
                out_ids.append(mid)
                out_idx.append(j)
                out_frames.append(hashlib.sha256(p + j.to_bytes(2, "little")).digest())
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.string()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frames, pa.binary()),
            }
        )


class ExtractAudio:
    """Actor-pool stage for audio: payload -> (media_id, sample_rate,
    n_samples, features[dim]) — loudness/spectral-style summary vector. Real
    path would use soundfile/librosa (imported once per actor); neither ships
    in this container, so the stub derives deterministic metadata + features
    from the payload bytes. With allow_fake=False and no library the stage
    raises at construction, never mid-stream."""

    def __init__(self, feature_dim: int = 32, allow_fake: bool = True):
        self.feature_dim = feature_dim
        try:
            import soundfile  # noqa: F401

            self._codec = soundfile
        except ImportError:
            self._codec = None
            if not allow_fake:
                raise NotImplementedError(
                    "audio decoding requires soundfile/librosa; allow_fake=True for stub"
                )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rates, counts, feats = [], [], []
        for p in payloads:
            p = p or b""
            if self._codec is not None:  # pragma: no cover - lib absent here
                import io

                data, rate = self._codec.read(io.BytesIO(p))
                rates.append(int(rate))
                counts.append(int(len(data)))
                feats.append(
                    np.resize(np.abs(np.asarray(data, dtype=np.float32)), self.feature_dim)
                )
            else:
                rates.append(16_000)
                counts.append(len(p) * 8)
                feats.append(_digest_floats(b"audio" + p, self.feature_dim))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(counts, pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def extract_audio(
    ds,
    feature_dim: int = 32,
    concurrency: int = 2,
    batch_size: int = 32,
    allow_fake: bool = True,
):
    """`allow_fake=False` makes the documented fail-fast reachable from the
    public helper: with no codec library each actor raises at construction
    instead of silently emitting the deterministic stub features."""
    return ds.filter(expr="kind == 'audio'").map_batches(
        ExtractAudio,
        fn_constructor_kwargs={"feature_dim": feature_dim, "allow_fake": allow_fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthetic_media(n: int = 64, seed: int = 5) -> pa.Table:
    """Deterministic fake media corpus matching MEDIA_SCHEMA (for tests)."""
    rng = np.random.default_rng(seed)
    ids = [f"m_{i:06d}" for i in range(n)]
    kinds = [("image", "audio", "video")[i % 3] for i in range(n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(["application/octet-stream"] * n, pa.string()),
            "width": pa.array([-1] * n, pa.int32()),
            "height": pa.array([-1] * n, pa.int32()),
            "duration_ms": pa.array([-1] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_images(
    ds,
    feature_dim: int = 64,
    concurrency: int = 4,
    batch_size: int = 32,
    allow_fake: bool = True,
):
    """The canonical wiring: small batches, actor pool, binary-safe arrow
    format end to end. `allow_fake=False` fails at actor construction when
    PIL is absent (never mid-stream)."""
    return ds.filter(expr="kind == 'image'").map_batches(
        DecodeImage,
        fn_constructor_kwargs={"feature_dim": feature_dim, "allow_fake": allow_fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
