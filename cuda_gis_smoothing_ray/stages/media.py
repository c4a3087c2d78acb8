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


# ---------------------------------------------------------------------------
# REAL dependency-free codecs: uncompressed 24-bit BMP + PCM16 mono WAV
# ---------------------------------------------------------------------------
#
# The stub boundary above stays for codecs this container genuinely lacks
# (JPEG/PNG/MP3 need PIL/torchaudio).  For the two formats a numpy parser
# can fully implement — BI_RGB BMP and PCM16 RIFF/WAVE — the decode below
# is REAL: it walks the actual file headers, undoes BMP's bottom-up BGR
# row-padded layout, and the fixture synthesizes genuine files that any
# external viewer could open.  Golden byte-literal tests pin the format
# (a self-consistent encode/decode bug cannot hide).

_BMP_W_CHOICES = 5   # width  = 8 + (id % 5) * 4
_BMP_H_CHOICES = 7   # height = 6 + (id % 7) * 2
_WAV_RATES = 3       # rate   = 8000 + (id % 3) * 4000
_WAV_N_CHOICES = 7   # n      = 400 + (id % 7) * 100


def _bmp_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id % _BMP_W_CHOICES) * 4, 6 + (media_id % _BMP_H_CHOICES) * 2


def _wav_params(media_id: int) -> tuple[int, int]:
    return (8000 + (media_id % _WAV_RATES) * 4000,
            400 + (media_id % _WAV_N_CHOICES) * 100)


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB, top-down -> uncompressed 24-bit BI_RGB BMP bytes
    (BITMAPINFOHEADER, bottom-up rows, BGR, rows padded to 4 bytes)."""
    h, w, _ = pixels.shape
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up, BGR
    body = rows.tobytes()
    header = np.zeros(54, dtype=np.uint8)
    header[0:2] = np.frombuffer(b"BM", np.uint8)
    header[2:6] = np.frombuffer(np.uint32(54 + len(body)).tobytes(), np.uint8)
    header[10:14] = np.frombuffer(np.uint32(54).tobytes(), np.uint8)
    header[14:18] = np.frombuffer(np.uint32(40).tobytes(), np.uint8)
    header[18:22] = np.frombuffer(np.int32(w).tobytes(), np.uint8)
    header[22:26] = np.frombuffer(np.int32(h).tobytes(), np.uint8)  # >0: bottom-up
    header[26:28] = np.frombuffer(np.uint16(1).tobytes(), np.uint8)
    header[28:30] = np.frombuffer(np.uint16(24).tobytes(), np.uint8)
    header[34:38] = np.frombuffer(np.uint32(len(body)).tobytes(), np.uint8)
    return header.tobytes() + body


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB top-down.  Real parser: validates
    magic / 24 bpp / BI_RGB, honors the pixel-data offset, undoes row
    padding, bottom-up order and BGR channel order."""
    head = np.frombuffer(payload, np.uint8, count=54)
    if bytes(head[0:2]) != b"BM":
        raise ValueError("not a BMP payload")
    off = int(head[10:14].view(np.uint32)[0])
    w = int(head[18:22].view(np.int32)[0])
    h = int(head[22:26].view(np.int32)[0])
    bpp = int(head[28:30].view(np.uint16)[0])
    comp = int(head[30:34].view(np.uint32)[0])
    if bpp != 24 or comp != 0 or h <= 0:
        raise NotImplementedError(f"only bottom-up 24bpp BI_RGB BMP (got bpp={bpp})")
    stride = (3 * w + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, count=h * stride, offset=off)
    rows = rows.reshape(h, stride)[:, : 3 * w]
    return rows.reshape(h, w, 3)[::-1, :, ::-1]  # un-flip, BGR -> RGB


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> PCM16 RIFF/WAVE bytes (fmt + data chunks)."""
    data = samples.astype("<i2").tobytes()
    n = len(data)

    def u32(x: int) -> bytes:
        return np.uint32(x).tobytes()

    def u16(x: int) -> bytes:
        return np.uint16(x).tobytes()

    return b"".join([
        b"RIFF", u32(36 + n), b"WAVE",
        b"fmt ", u32(16), u16(1), u16(1), u32(rate), u32(rate * 2),
        u16(2), u16(16),
        b"data", u32(n), data,
    ])


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples, sample_rate).  Real parser: walks RIFF
    chunks generically (skips unknown chunks), requires PCM16 mono."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int(np.frombuffer(payload, "<u4", count=1, offset=pos + 4)[0])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = int(np.frombuffer(body, "<u2", count=1)[0])
            ch = int(np.frombuffer(body, "<u2", count=1, offset=2)[0])
            bits = int(np.frombuffer(body, "<u2", count=1, offset=14)[0])
            if (fmt, ch, bits) != (1, 1, 16):
                raise NotImplementedError(
                    f"only PCM16 mono WAV (got fmt={fmt} ch={ch} bits={bits})")
            rate = int(np.frombuffer(body, "<u4", count=1, offset=4)[0])
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def synth_media_table(sf_dir: str):
    """documents.doc_id -> (media_id, fmt, payload:binary) with REAL media
    bytes: even ids get a BMP whose RGB pixel stream (top-down row-major,
    flat index i over h*w*3 values) is ``(id*31 + i*7) % 256``; odd ids get
    a PCM16 WAV whose samples are ``(id*17 + i*13) % 4096 - 2048``.  Pure
    arithmetic content so the SQL oracle regenerates every value; real
    file layout so the decoder exercises genuine format parsing.

    Per-payload assembly is a Python loop over rows — unavoidable for
    variable-size binary synthesis (a real ingest reads files), bounded by
    batch size, and NOT on any hot analytic path."""
    import ray.data as rd

    from .. import tune_data_context
    tune_data_context()

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def build(batch: pa.Table) -> pa.Table:
        mid = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fmts, payloads = [], []
        for m in mid.tolist():
            if m % 2 == 0:
                w, h = _bmp_dims(m)
                i = np.arange(h * w * 3, dtype=np.int64)
                px = ((m * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
                fmts.append("bmp")
                payloads.append(encode_bmp(px))
            else:
                rate, n = _wav_params(m)
                i = np.arange(n, dtype=np.int64)
                s = ((m * 17 + i * 13) % 4096 - 2048).astype(np.int16)
                fmts.append("wav")
                payloads.append(encode_wav(s, rate))
        return pa.table(
            {
                "media_id": pa.array(mid),
                "fmt": pa.array(fmts, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs.map_batches(build, batch_format="pyarrow", batch_size=256)


class BuiltinMediaDecode:
    """Actor-pool REAL decode stage: magic-sniffs each payload, parses BMP /
    WAV with the numpy codecs above, and emits order-sensitive stats
    (``checksum = sum(i * v_i)`` over the decoded value stream) so a parser
    that misreads padding, row order or channel order CANNOT match the
    oracle.  Unknown formats raise — the honest stub boundary."""

    def __init__(self):
        from .. import tune_worker_allocator

        tune_worker_allocator()

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch.column("media_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = batch.column("payload")
        out = {k: [] for k in ("width", "height", "sample_rate", "n_units",
                               "v_min", "v_max", "v_sum", "checksum")}
        # per-payload loop: real codecs decode one variable-size file at a
        # time (same shape as a PIL/torchaudio deployment); all pixel /
        # sample math inside is vectorized numpy
        for j in range(len(payloads)):
            raw = payloads[j].as_py()
            if raw[:2] == b"BM":
                px = decode_bmp(raw)
                v = px.reshape(-1).astype(np.int64)
                h, w, _ = px.shape
                meta = (w, h, 0)
            elif raw[:4] == b"RIFF":
                s, rate = decode_wav(raw)
                v = s.astype(np.int64)
                meta = (0, 0, rate)
            else:
                raise NotImplementedError(
                    "unknown media magic — only BMP/WAV have builtin codecs")
            i = np.arange(len(v), dtype=np.int64)
            for k, val in zip(out, (*meta, len(v), int(v.min()), int(v.max()),
                                    int(v.sum()), int((i * v).sum()))):
                out[k].append(val)
        return pa.table(
            {
                "media_id": pa.array(mids),
                "fmt": batch.column("fmt"),
                **{k: pa.array(np.asarray(vs, dtype=np.int64)) for k, vs in out.items()},
            }
        )


def media_decode_real(ds, concurrency=(1, 8), batch_size: int = 256):
    """media Dataset with real BMP/WAV payloads -> decoded stats.  Same
    actor-pool / small-batch shape as :func:`media_decode`; the work per
    row is genuine format parsing + pixel/sample reductions."""
    return ds.map_batches(
        BuiltinMediaDecode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_resize_real(ds, target_w: int = 16, target_h: int = 12,
                      batch_size: int = 256):
    """REAL resize over the synthesized BMP payloads: decode with the numpy
    BMP parser, nearest-neighbor resample to (target_h, target_w) —
    ``src_r = out_r * h // target_h`` (the floor mapping every production
    resampler's 'nearest' mode uses) — and emit order-sensitive stats of the
    RESIZED pixel stream, so the SQL oracle (which regenerates source pixels
    by index arithmetic and applies the same floor mapping) rejects any
    mis-indexed gather.  Image rows only; WAV payloads are filtered out."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("fmt"), "bmp"))
        mids = batch.column("media_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = batch.column("payload")
        out = {k: [] for k in ("src_w", "src_h", "n_units", "v_sum", "checksum")}
        out_r = np.arange(target_h, dtype=np.int64)
        out_c = np.arange(target_w, dtype=np.int64)
        for j in range(len(payloads)):
            px = decode_bmp(payloads[j].as_py())
            h, w, _ = px.shape
            rs = out_r * h // target_h
            cs = out_c * w // target_w
            resized = px[np.ix_(rs, cs)]  # (target_h, target_w, 3) gather
            v = resized.reshape(-1).astype(np.int64)
            i = np.arange(len(v), dtype=np.int64)
            for k, val in zip(out, (w, h, len(v), int(v.sum()), int((i * v).sum()))):
                out[k].append(val)
        return pa.table(
            {
                "media_id": pa.array(mids),
                "out_w": pa.array(np.full(len(mids), target_w, np.int64)),
                "out_h": pa.array(np.full(len(mids), target_h, np.int64)),
                **{k: pa.array(np.asarray(vs, np.int64)) for k, vs in out.items()},
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def audio_resample_real(ds, target_rate: int = AUDIO_TARGET_RATE,
                        batch_size: int = 256):
    """REAL rate conversion over the synthesized WAV payloads: decode with
    the numpy WAV parser, nearest-sample resample to ``target_rate`` —
    ``src_i = out_i * src_rate // target_rate``, ``n_out = n_in *
    target_rate // src_rate`` (all-integer, so the SQL oracle reproduces
    every output sample exactly).  Audio rows only."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("fmt"), "wav"))
        mids = batch.column("media_id").to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = batch.column("payload")
        out = {k: [] for k in ("src_rate", "n_in", "n_out", "v_sum", "checksum")}
        for j in range(len(payloads)):
            s, rate = decode_wav(payloads[j].as_py())
            n_out = len(s) * target_rate // rate
            idx = np.arange(n_out, dtype=np.int64) * rate // target_rate
            v = s[idx].astype(np.int64)
            i = np.arange(n_out, dtype=np.int64)
            for k, val in zip(out, (rate, len(s), n_out, int(v.sum()),
                                    int((i * v).sum()))):
                out[k].append(val)
        return pa.table(
            {
                "media_id": pa.array(mids),
                "target_rate": pa.array(np.full(len(mids), target_rate, np.int64)),
                **{k: pa.array(np.asarray(vs, np.int64)) for k, vs in out.items()},
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)


def audio_loudness(ds, batch_size: int = 256):
    """REAL loudness QA over the WAV payloads: decode with the numpy RIFF
    parser, then per clip the exact int64 sum of squares, peak magnitude,
    and ``rms_db = 10*log10(sum_sq / (n * 2048^2))`` — dB relative to the
    synth generator's 2048 full-scale, ONE float op round6-quantized,
    all-silence clamped (``greatest(sum_sq, 1)``).  Audio rows only.

    The SQL oracle regenerates the sample stream arithmetically, so a
    byte-level mis-parse (wrong chunk walk, endianness, offset) fails the
    exact integer sums before the float ever matters.  Streams: actorless
    map over payload batches, no shuffle."""

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("fmt"), "wav"))
        mids = batch.column("media_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        payloads = batch.column("payload")
        rates, ns, peaks, sums, dbs = [], [], [], [], []
        for j in range(len(payloads)):
            s, rate = decode_wav(payloads[j].as_py())
            v = s.astype(np.int64)
            n = len(v)
            ss = int((v * v).sum())
            peaks.append(int(np.abs(v).max()) if n else 0)
            rates.append(rate)
            ns.append(n)
            sums.append(ss)
            db = 10.0 * np.log10(float(max(ss, 1)) / float(max(n, 1) * 4194304))
            dbs.append(np.floor(db * 1e6 + 0.5) / 1e6)
        return pa.table({
            "media_id": pa.array(mids),
            "sample_rate": pa.array(np.asarray(rates, np.int64)),
            "n_samples": pa.array(np.asarray(ns, np.int64)),
            "peak": pa.array(np.asarray(peaks, np.int64)),
            "sum_sq": pa.array(np.asarray(sums, np.int64)),
            "rms_db": pa.array(np.asarray(dbs, np.float64)),
        })

    return ds.map_batches(f, batch_format="pyarrow", batch_size=batch_size)
