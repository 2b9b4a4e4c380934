"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. The decode kernels are STUBBED (no imaging /
audio libraries in this container — see prompt): ``DecodeImageStage``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable feature vectors so the
Ray-side plumbing (schema, batch size, actor signature, output layout)
is real and tested.

Schema contract:
  media(media_id:int64, kind:string, payload:binary,
        meta:struct<width:int32, height:int32, sample_rate:int32>)
  -> features(media_id:int64, kind:string, feat:list<float>,
              width:int32, height:int32)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        (
            "meta",
            pa.struct(
                [("width", pa.int32()), ("height", pa.int32()), ("sample_rate", pa.int32())]
            ),
        ),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rs = np.random.RandomState(seed)
    kinds = [["image", "audio", "video"][i % 3] for i in range(n)]
    payloads = [rs.bytes(256 + (i % 5) * 128) for i in range(n)]
    meta = [
        {"width": 32 + (i % 8) * 16, "height": 32 + (i % 4) * 16, "sample_rate": 16000}
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(meta, MEDIA_SCHEMA.field("meta").type),
        }
    )


class DecodeImageStage:
    """Actor-pool decode/feature stage.

    Real deployment: __init__ loads the codec/model once per actor;
    __call__ decodes payloads and emits feature vectors. Here the
    decode is gated: fake=False raises NotImplementedError (no imaging
    libs in this container); fake=True derives a deterministic
    16-float feature from the payload bytes.
    """

    FEAT_DIM = 16

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image decode requires an imaging library not present in "
                "this container; construct with fake=True for the "
                "deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        feats = []
        for p in payloads:
            arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
            # deterministic fake "embedding": strided means, unit-normed
            chunks = np.array_split(arr, self.FEAT_DIM)
            v = np.array([c.mean() if len(c) else 0.0 for c in chunks])
            norm = np.linalg.norm(v)
            feats.append((v / norm if norm else v).astype(np.float32).tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feat": pa.array(feats, pa.list_(pa.float32())),
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
            }
        )


def decode_features(ds, fake: bool = True, concurrency=(1, 2), batch_size: int = 16):
    """Feature-extraction pipeline. Small batch_size: large binary
    payloads mean batch bytes, not rows, bound memory (SURVEY §7
    hard-parts 6)."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class FrameSampleStage:
    """Video frame sampling: one media row -> ``n_frames`` frame rows
    (flat-map shape realized inside map_batches — explode with numpy
    repeat, no per-row Python beyond the payload slicing itself).

    Real deployment: __init__ opens the video codec once per actor;
    __call__ demuxes and decodes every k-th frame. Gated the same way
    as DecodeImageStage: fake=True slices the payload into
    deterministic equal-length pseudo-frames so schema/explode/actor
    plumbing is real and tested."""

    def __init__(self, n_frames: int = 4, fake: bool = False):
        self.n_frames = n_frames
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "video demux/decode requires an av library not present in "
                "this container; construct with fake=True for the "
                "deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames_idx, frames = [], [], [], []
        for mid, kind, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if kind != "video":
                continue
            step = max(1, len(p) // self.n_frames)
            for k in range(self.n_frames):
                ids.append(mid)
                kinds.append(kind)
                frames_idx.append(k)
                frames.append(p[k * step : (k + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(frames_idx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def sample_frames(ds, n_frames: int = 4, fake: bool = True, concurrency=(1, 2), batch_size: int = 8):
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


class AudioFeatureStage:
    """Audio feature extraction (the third media kind): windowed energy
    features over the payload, normalized by the metadata sample rate.
    Same environment gate as the image/video stages — fake=True derives
    deterministic features from payload bytes so the Ray plumbing is
    real; fake=False raises (no audio libs in this container)."""

    N_WINDOWS = 8

    def __init__(self, fake: bool = False):
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "audio decode requires an audio library not present in "
                "this container; construct with fake=True for the "
                "deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, feats, durs = [], [], []
        for mid, kind, p, meta in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
            batch.column("meta").to_pylist(),
        ):
            if kind != "audio":
                continue
            arr = np.frombuffer(p, dtype=np.uint8).astype(np.float64) - 127.5
            windows = np.array_split(arr, self.N_WINDOWS)
            energy = np.array([float(np.sqrt((w**2).mean())) if len(w) else 0.0 for w in windows])
            peak = energy.max()
            ids.append(mid)
            feats.append((energy / peak if peak else energy).astype(np.float32).tolist())
            sr = meta["sample_rate"] or 1
            durs.append(len(p) / sr)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "energy": pa.array(feats, pa.list_(pa.float32())),
                "duration_s": pa.array(durs, pa.float64()),
            }
        )


def audio_features(ds, fake: bool = True, concurrency=(1, 2), batch_size: int = 16):
    return ds.map_batches(
        AudioFeatureStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
