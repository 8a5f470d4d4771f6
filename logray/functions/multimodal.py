"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video travel as Arrow ``binary`` columns with sidecar
metadata columns (mime, width/height or sample rate, nbytes).  The Ray-side
plumbing — schema, small-batch actor-pool stages, output layout — is real
and tested; the actual decode kernels are STUBBED because no image/audio
library ships in this container:

- with ``fake=True`` (default) each stage produces deterministic fake
  features derived from the payload bytes (so pipelines and tests run
  end-to-end);
- with ``fake=False`` the stages raise ``NotImplementedError`` at the point
  where a real decoder (Pillow / torchaudio / pyav) would be called.

Batch sizing note: binary payloads are large — these stages default to
``batch_size=256`` so batch x concurrency stays within worker heaps; tune
with the payload size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from logray.functions.fingerprint import content_hash

DEFAULT_BATCH_SIZE = 256

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("payload", pa.binary()),
        pa.field("nbytes", pa.int64()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (opaque byte blobs + metadata)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    mimes = [("image/png", "audio/wav", "video/mp4")[i % 3] for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "mime": pa.array(mimes),
            "payload": pa.array(payloads, pa.binary()),
            "nbytes": pa.array([len(p) for p in payloads], pa.int64()),
        }
    )


class DecodeImageBatch:
    """image payload -> (width, height, channels) metadata + thumbnail bytes.

    Real path: Pillow decode + resize.  Stubbed: deterministic pseudo-dims
    from the payload hash; "thumbnail" = first 64 payload bytes."""

    def __init__(self, fake: bool = True, thumb_px: int = 32):
        self.fake = fake
        self.thumb_px = thumb_px

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires Pillow, not available in this container"
            )
        # content_hash reads the raw Arrow buffer; binary columns share the
        # string layout so no cast is needed
        h = content_hash(t["payload"])
        width = (h % np.uint64(1920) + np.uint64(64)).astype(np.int64)
        height = (h // np.uint64(7) % np.uint64(1080) + np.uint64(64)).astype(np.int64)
        thumbs = [bytes(p.as_py()[:64]) for p in t["payload"]]
        return (
            t.append_column("width", pa.array(width))
            .append_column("height", pa.array(height))
            .append_column("channels", pa.array(np.full(len(h), 3, np.int64)))
            .append_column("thumbnail", pa.array(thumbs, pa.binary()))
        )


class ExtractAudioFeaturesBatch:
    """audio payload -> (duration_s, sample_rate, embedding list<float>).

    Real path: decode + mel features.  Stubbed: deterministic features from
    byte statistics (mean/std/quantiles of the payload)."""

    def __init__(self, fake: bool = True, dim: int = 8):
        self.fake = fake
        self.dim = dim

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real audio decode requires an audio library, not available here"
            )
        feats, durs = [], []
        for p in t["payload"]:
            b = np.frombuffer(p.as_py(), np.uint8).astype(np.float32)
            qs = np.quantile(b, np.linspace(0, 1, self.dim - 2)) if len(b) else np.zeros(self.dim - 2)
            feats.append(np.concatenate([[b.mean() if len(b) else 0.0, b.std() if len(b) else 0.0], qs]).astype(np.float32))
            durs.append(len(b) / 16000.0)
        return (
            t.append_column("duration_s", pa.array(durs, pa.float64()))
            .append_column("sample_rate", pa.array([16000] * t.num_rows, pa.int64()))
            .append_column("audio_embedding", pa.array([f.tolist() for f in feats], pa.list_(pa.float32())))
        )


class SampleFramesBatch:
    """video payload -> every-Nth-chunk "frames" (list<binary>).

    Real path: pyav keyframe sampling.  Stubbed: fixed-stride byte chunks."""

    def __init__(self, fake: bool = True, n_frames: int = 4, chunk: int = 256):
        self.fake = fake
        self.n_frames = n_frames
        self.chunk = chunk

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real frame sampling requires pyav, not available here"
            )
        frames = []
        for p in t["payload"]:
            b = p.as_py()
            stride = max(len(b) // max(self.n_frames, 1), 1)
            frames.append([b[i * stride : i * stride + self.chunk] for i in range(self.n_frames)])
        return t.append_column("frames", pa.array(frames, pa.list_(pa.binary())))


def decode_stage(ds, stage_cls, concurrency=2, batch_size: int = DEFAULT_BATCH_SIZE, **kw):
    """Run a decode/extract stage as an actor pool with binary-payload-sized
    batches."""
    return ds.map_batches(
        stage_cls,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
