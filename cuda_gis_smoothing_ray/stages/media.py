"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — here the
``pages.html`` bytes stand in as the payload (this container has no
image/audio codecs; see :class:`MediaDecode` for the stub boundary).  What
IS real and tested: the Ray-side plumbing — schema, actor-pool stage shape,
small-batch sizing for wide binary rows, deterministic feature layout.

Scale notes: binary rows are wide, so the decode stage uses a SMALL
``batch_size`` (payload x batch x concurrency must fit the worker heap) and
an actor pool (real decoders hold codec state / model weights).  The
payload column is projected away immediately after feature extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.pages import read_pages

KINDS = ("image", "audio", "video")
FEAT_DIM = 8


def media_table(sf_dir: str, replicate: int = 1):
    """pages -> media Dataset (media_id, kind, payload:binary).

    kind is assigned deterministically (media_id % 3) so the oracle can
    reproduce it."""
    pages = read_pages(sf_dir, replicate=replicate, include_html=True)

    def shape(batch: pa.Table) -> pa.Table:
        mid = batch.column("page_id").to_numpy(zero_copy_only=False).astype(np.int64)
        kind = np.array(KINDS, dtype=object)[mid % 3]
        return pa.table(
            {
                "media_id": pa.array(mid),
                "kind": pa.array(kind, pa.string()),
                "payload": batch.column("html"),
            }
        )

    return pages.map_batches(shape, batch_format="pyarrow", batch_size=None)


class MediaDecode:
    """Actor-pool decode/feature stage.

    ``__init__`` is where a real deployment loads codec/model state ONCE per
    actor (PIL / torchaudio / decord).  Those libraries are not in this
    container, so the decode is a STUB: if a real decoder is requested and
    unavailable we raise ``NotImplementedError`` loudly; the default
    deterministic fake derives metadata/features from the payload bytes so
    the full pipeline (schema, shuffle, sinks, oracles) is exercised end to
    end with stable outputs.
    """

    def __init__(self, real_decoder: bool = False, feat_dim: int = FEAT_DIM):
        from .. import tune_worker_allocator

        tune_worker_allocator()
        self.feat_dim = feat_dim
        self.real = real_decoder
        if real_decoder:
            try:  # pragma: no cover - not installed in this container
                import PIL.Image  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real media decoding needs PIL/torchaudio; this container "
                    "ships neither — use the deterministic fake (real_decoder=False)"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.real:  # pragma: no cover
            raise NotImplementedError("real decode path not available in this container")
        mid = batch.column("media_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nbytes = pc.binary_length(batch.column("payload")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # deterministic fake "decode": metadata as pure arithmetic on
        # (payload length, media id) — mirrored exactly by the SQL oracle
        width = 64 + (nbytes * 7) % 1024
        height = 64 + (nbytes * 13) % 768
        duration_ms = np.where(
            mid % 3 == 0, 0, 1000 + (nbytes * 31) % 600000
        ).astype(np.int64)
        # deterministic fake features: FEAT_DIM moments of the byte stream,
        # vectorized per batch via one flat frombuffer pass
        payload = batch.column("payload")
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        buf = np.frombuffer(payload.buffers()[2], dtype=np.uint8)
        offs = np.frombuffer(payload.buffers()[1], dtype=np.int32)[
            payload.offset : payload.offset + len(payload) + 1
        ]
        # per-row byte-mean via one cumulative-sum pass (no per-row loop)
        csum = np.concatenate(([0.0], np.cumsum(buf.astype(np.float64))))
        lo, hi = offs[:-1], offs[1:]
        seg = (csum[hi] - csum[lo]) / np.maximum(hi - lo, 1)
        feats = np.zeros((len(mid), self.feat_dim), dtype=np.float64)
        for d in range(self.feat_dim):
            feats[:, d] = np.floor((seg * (d + 1)) % 256.0 * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "media_id": pa.array(mid),
                "kind": batch.column("kind"),
                "n_bytes": pa.array(nbytes),
                "width": pa.array(width),
                "height": pa.array(height),
                "duration_ms": pa.array(duration_ms),
                "feature": pa.array(list(feats), pa.list_(pa.float64(), self.feat_dim)),
            }
        )


def media_decode(ds, concurrency=(1, 8), batch_size: int = 512):
    """media Dataset -> decoded metadata + features.

    Small batch_size on purpose: with real payloads (MBs each), batch x
    actor memory is the binding constraint, not task overhead."""
    return ds.map_batches(
        MediaDecode,
        fn_constructor_kwargs={},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_resize(ds, target_w: int = 256, target_h: int = 256):
    """Decoded media -> resize-stage output (stubbed pixel work, real
    plumbing): per row the target dims and the scale factors a real
    resampler would apply.  A real deployment swaps the arithmetic for a
    PIL/cv2 call inside the same actor-pool stage; everything around it
    (schema, batch sizing, oracle) is unchanged."""

    def f(batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = np.floor(target_w / w * 1e6 + 0.5) / 1e6
        sy = np.floor(target_h / h * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "out_w": pa.array(np.full(len(w), target_w, dtype=np.int64)),
                "out_h": pa.array(np.full(len(w), target_h, dtype=np.int64)),
                "scale_x": pa.array(sx),
                "scale_y": pa.array(sy),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


FRAME_INTERVAL_MS = 40_000
MAX_FRAMES = 8


def frame_sample(ds, interval_ms: int = FRAME_INTERVAL_MS, max_frames: int = MAX_FRAMES):
    """Decoded media -> sampled video frames: one output row per sampled
    frame (media_id, frame_idx, frame_ts_ms), frames at ``interval_ms``
    spacing capped at ``max_frames``; non-video rows (duration 0) emit
    nothing.  The fan-out is batch-local (repeat + arange), so the stage
    streams; a real deployment decodes the frame bytes at each ts inside
    the same expansion."""

    def f(batch: pa.Table) -> pa.Table:
        mid = batch.column("media_id").to_numpy(zero_copy_only=False).astype(np.int64)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.minimum(1 + dur // interval_ms, max_frames)
        n = np.where(dur > 0, n, 0).astype(np.int64)
        rep_mid = np.repeat(mid, n)
        # per-row frame indices 0..n_i-1, fully vectorized
        total = int(n.sum())
        if total == 0:
            return pa.table(
                {"media_id": pa.array([], pa.int64()), "frame_idx": pa.array([], pa.int64()),
                 "frame_ts_ms": pa.array([], pa.int64())}
            )
        ends = np.cumsum(n)
        idx = np.arange(total, dtype=np.int64) - np.repeat(ends - n, n)
        return pa.table(
            {
                "media_id": pa.array(rep_mid),
                "frame_idx": pa.array(idx),
                "frame_ts_ms": pa.array(idx * interval_ms),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


AUDIO_TARGET_RATE = 16_000


def audio_resample(ds, target_rate: int = AUDIO_TARGET_RATE):
    """Decoded media -> audio resample-stage output (stubbed samples, real
    plumbing): audio rows only (kind = 'audio'), with the fake source rate
    derived from payload arithmetic (mirrored by the SQL oracle), the
    target rate, the rational resample ratio and the output sample count a
    real polyphase resampler would produce.  A real deployment swaps the
    arithmetic for torchaudio/soxr inside the same stage; schema, filter
    and batch flow are unchanged."""
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("kind"), "audio"))
        nbytes = batch.column("n_bytes").to_numpy(zero_copy_only=False).astype(np.int64)
        dur = batch.column("duration_ms").to_numpy(zero_copy_only=False).astype(np.int64)
        src_rate = 8000 + (nbytes * 11) % 40000  # deterministic fake
        n_in = src_rate * dur // 1000
        n_out = np.int64(target_rate) * dur // 1000
        ratio = np.floor(np.float64(target_rate) / src_rate.astype(np.float64) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "src_rate": pa.array(src_rate),
                "target_rate": pa.array(np.full(len(nbytes), target_rate, np.int64)),
                "ratio": pa.array(ratio),
                "n_in": pa.array(n_in),
                "n_out": pa.array(n_out),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
