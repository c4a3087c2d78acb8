"""Multimodal plumbing + event window/session operator tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_media_decode_deterministic(sf_dir):
    from cuda_gis_smoothing_ray.stages.media import media_decode, media_table

    a = media_decode(media_table(sf_dir)).to_pandas().sort_values("media_id")
    b = media_decode(media_table(sf_dir)).to_pandas().sort_values("media_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert set(a["kind"]) == {"image", "audio", "video"}
    assert (a.loc[a["kind"] == "image", "duration_ms"] == 0).all()
    assert a["feature"].map(len).eq(8).all()


def test_media_real_decoder_is_a_loud_stub():
    from cuda_gis_smoothing_ray.stages.media import MediaDecode

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MediaDecode(real_decoder=True)


def _events_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="datetime64[us]")
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([float(r[4]) for r in rows], pa.float64()),
            }
        )
    )


def test_sessionize_gap_semantics():
    from cuda_gis_smoothing_ray.stages.events import sessionize

    rows = [
        (0, "2024-01-01T00:00:00", 1, "view", 1.0),
        (1, "2024-01-01T00:10:00", 1, "view", 1.0),   # same session (10m gap)
        (2, "2024-01-01T01:00:00", 1, "view", 1.0),   # new session (50m gap)
        (3, "2024-01-01T01:29:00", 1, "buy", 2.0),    # same session (29m gap)
        (4, "2024-01-01T00:00:00", 2, "view", 1.0),   # other user
    ]
    out = sessionize(_events_ds(rows)).to_pandas().sort_values("event_id")
    assert out["session_idx"].tolist() == [0, 0, 1, 1, 0]
    starts = out["session_start"].astype(str).tolist()
    assert starts[0] == starts[1] == "2024-01-01 00:00:00"
    assert starts[2] == starts[3] == "2024-01-01 01:00:00"


def test_window_aggregate_vs_pandas(sf_dir):
    from cuda_gis_smoothing_ray.stages.events import read_events, window_aggregate

    got = window_aggregate(read_events(sf_dir)).to_pandas()
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    raw["window_start"] = raw["ts"].dt.floor("1h")
    want = (
        raw.groupby(["window_start", "event_type"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    m = got.merge(want, on=["window_start", "event_type"], suffixes=("", "_w"))
    assert len(m) == len(want) == len(got)
    assert (m["n_events"] == m["n_events_w"]).all()
    assert np.allclose(m["sum_value"], m["sum_value_w"], rtol=1e-9)


def test_asof_join_vs_bruteforce(sf_dir):
    import pandas as pd

    from cuda_gis_smoothing_ray.stages import events as ev

    got = ev.asof_join(ev.read_events(sf_dir)).to_pandas().sort_values("event_id").reset_index(drop=True)
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    want = []
    for _, row in df[df.event_type == "purchase"].iterrows():
        cand = df[(df.user_id == row.user_id) & (df.event_type == "view") & (df.ts <= row.ts)]
        if len(cand):
            m = cand.sort_values(["ts", "event_id"]).iloc[-1]
            want.append((row.event_id, row.user_id, m.event_id,
                         (row.ts - m.ts).value // 1000))
    want = pd.DataFrame(want, columns=["event_id", "user_id", "matched_event_id", "lag_us"]).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_media_resize_and_frame_sample(sf_dir):
    import numpy as np

    from cuda_gis_smoothing_ray.stages import media

    decoded = media.media_decode(media.media_table(sf_dir))
    rs = media.media_resize(decoded).to_pandas()
    assert (rs["out_w"] == 256).all() and (rs["out_h"] == 256).all()
    assert (rs["scale_x"] > 0).all()

    dec = media.media_decode(media.media_table(sf_dir)).to_pandas()
    fr = media.frame_sample(media.media_decode(media.media_table(sf_dir))).to_pandas()
    # zero-duration media emit no frames; others 1..MAX_FRAMES at interval spacing
    zero_ids = set(dec[dec["duration_ms"] == 0]["media_id"])
    assert zero_ids.isdisjoint(set(fr["media_id"]))
    per = fr.groupby("media_id")["frame_idx"].agg(["count", "max"])
    assert (per["count"] <= media.MAX_FRAMES).all()
    assert (per["max"] == per["count"] - 1).all()  # contiguous 0..n-1
    assert (fr["frame_ts_ms"] == fr["frame_idx"] * media.FRAME_INTERVAL_MS).all()
    for mid, n in per["count"].head(10).items():
        d = int(dec[dec["media_id"] == mid]["duration_ms"].iloc[0])
        assert n == min(1 + d // media.FRAME_INTERVAL_MS, media.MAX_FRAMES)


def test_audio_resample(sf_dir):
    from cuda_gis_smoothing_ray.stages import media

    decoded = media.media_decode(media.media_table(sf_dir))
    out = media.audio_resample(decoded).to_pandas()
    dec = decoded.to_pandas()
    audio = dec[dec["kind"] == "audio"]
    assert set(out["media_id"]) == set(audio["media_id"])
    assert (out["target_rate"] == media.AUDIO_TARGET_RATE).all()
    assert ((out["src_rate"] >= 8000) & (out["src_rate"] < 48000)).all()
    # output length = rate conversion of input length (integer-ms duration)
    merged = out.merge(audio[["media_id", "duration_ms"]], on="media_id")
    assert (merged["n_in"] == merged["src_rate"] * merged["duration_ms"] // 1000).all()
    assert (merged["n_out"] == media.AUDIO_TARGET_RATE * merged["duration_ms"] // 1000).all()


def test_gap_fill_zero_fills_inactive_buckets():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import gap_fill

    # user 1: events in buckets 0 and 3 (of width 10us) -> rows for 0..3;
    # user 2: single event -> exactly one row
    ts = np.array([2, 5, 31, 104], dtype="datetime64[us]")
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a"] * 4),
        "value": pa.array([1.0, 2.0, 0.405, 7.0]),
    }))
    out = (
        gap_fill(ds, bucket_us=10)
        .to_pandas()
        .sort_values(["user_id", "bucket_start"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 1, 1, 2]
    assert out["bucket_start"].to_numpy().astype(np.int64).tolist() == [0, 10, 20, 30, 100]
    assert out["n_events"].tolist() == [2, 0, 0, 1, 1]
    # exact cents incl. the floor(x*100+0.5) rounding rule (0.405 -> 41)
    assert out["sum_cents"].tolist() == [300, 0, 0, 41, 700]


def test_funnel_window_and_ordering():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import funnel

    def ev(eid, us, uid, typ):
        return (eid, np.datetime64(us, "us"), uid, typ, 1.0)

    rows = [
        # user 1: view@10, click@20 (in window), purchase@25 -> stage 3
        ev(1, 10, 1, "view"), ev(2, 20, 1, "click"), ev(3, 25, 1, "purchase"),
        # user 2: click BEFORE first view never counts; no click after -> stage 1
        ev(4, 5, 2, "click"), ev(5, 10, 2, "view"),
        # user 3: click too late (window 50) -> stage 1
        ev(6, 0, 3, "view"), ev(7, 100, 3, "click"),
        # user 4: no view at all -> stage 0
        ev(8, 0, 4, "purchase"),
    ]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows]),
    }))
    out = (
        funnel(ds, window_us=50)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["stage"].tolist() == [3, 1, 1, 0]
    assert out["ts_1"].tolist() == [10, 10, 0, -1]
    assert out["ts_2"].tolist() == [20, -1, -1, -1]
    assert out["ts_3"].tolist() == [25, -1, -1, -1]


def test_cohort_retention_hand_case():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import DAY_US, cohort_retention

    us = 1_000_000
    day = 86_400 * us
    rows = [
        # user 1: first day 0, active days 0, 1, 3 (two events day 0 dedup)
        {"event_id": 1, "ts": np.datetime64(0, "us"), "user_id": 1},
        {"event_id": 2, "ts": np.datetime64(5 * us, "us"), "user_id": 1},
        {"event_id": 3, "ts": np.datetime64(day + us, "us"), "user_id": 1},
        {"event_id": 4, "ts": np.datetime64(3 * day, "us"), "user_id": 1},
        # user 2: first day 1, active days 1, 3
        {"event_id": 5, "ts": np.datetime64(day + 2 * us, "us"), "user_id": 2},
        {"event_id": 6, "ts": np.datetime64(3 * day + us, "us"), "user_id": 2},
    ]
    out = cohort_retention(rd.from_items(rows), bucket_us=DAY_US).to_pandas()
    got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1, (1, 2): 1}


def test_cooccurrence_hand_case_and_cap():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import WINDOW_US, cooccurrence

    us = 1_000_000
    rows = [
        # window 0: users 1, 2, 3 (user 1 twice -> dedup)
        {"event_id": 1, "ts": np.datetime64(0, "us"), "user_id": 1},
        {"event_id": 2, "ts": np.datetime64(5 * us, "us"), "user_id": 1},
        {"event_id": 3, "ts": np.datetime64(6 * us, "us"), "user_id": 2},
        {"event_id": 4, "ts": np.datetime64(7 * us, "us"), "user_id": 3},
        # window 1: users 1, 2
        {"event_id": 5, "ts": np.datetime64(WINDOW_US + us, "us"), "user_id": 1},
        {"event_id": 6, "ts": np.datetime64(WINDOW_US + 2 * us, "us"), "user_id": 2},
    ]
    out = cooccurrence(rd.from_items(rows)).to_pandas()
    got = {(r.a, r.b): r.n_windows for r in out.itertuples()}
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    capped = cooccurrence(rd.from_items(rows), max_users_per_window=2).to_pandas()
    got2 = {(r.a, r.b): r.n_windows for r in capped.itertuples()}
    assert got2 == {(1, 2): 2}  # window-0 user 3 truncated deterministically


def test_ohlc_bars_hand_case():
    import pandas as pd
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import WINDOW_US, ohlc_bars

    us = 1_000_000
    rows = [
        {"event_id": 1, "ts": np.datetime64(10 * us, "us"), "user_id": 1,
         "event_type": "view", "value": 5.0},
        {"event_id": 2, "ts": np.datetime64(20 * us, "us"), "user_id": 1,
         "event_type": "view", "value": 9.0},
        {"event_id": 3, "ts": np.datetime64(30 * us, "us"), "user_id": 1,
         "event_type": "view", "value": 1.0},
        # tie at same ts as event 1: higher event_id loses the open
        {"event_id": 4, "ts": np.datetime64(10 * us, "us"), "user_id": 2,
         "event_type": "view", "value": 7.0},
        {"event_id": 5, "ts": np.datetime64(WINDOW_US + us, "us"), "user_id": 1,
         "event_type": "view", "value": 2.0},
    ]
    out = ohlc_bars(rd.from_items(rows)).to_pandas().sort_values("window_start")
    w0 = out.iloc[0]
    assert w0["open_cents"] == 500 and w0["close_cents"] == 100
    assert w0["high_cents"] == 900 and w0["low_cents"] == 100
    assert w0["n_events"] == 4
    w1 = out.iloc[1]
    assert w1["open_cents"] == w1["close_cents"] == 200 and w1["n_events"] == 1


# ---------------------------------------------------------------------------
# REAL BMP/WAV codecs: golden byte literals pin the file format, so a
# self-consistent encode/decode bug cannot hide behind the roundtrip
# ---------------------------------------------------------------------------


def test_bmp_golden_byte_literal():
    import struct

    from cuda_gis_smoothing_ray.stages.media import decode_bmp, encode_bmp

    # hand-built 2x2 24bpp BI_RGB BMP: stride 8 (2 pad bytes/row), rows
    # bottom-up, channels BGR
    header = (b"BM" + struct.pack("<I", 54 + 16) + b"\x00\x00\x00\x00"
              + struct.pack("<I", 54)
              + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0))
    bottom_row = bytes([9, 8, 7, 12, 11, 10, 0, 0])   # image row 1: (7,8,9),(10,11,12)
    top_row = bytes([3, 2, 1, 6, 5, 4, 0, 0])         # image row 0: (1,2,3),(4,5,6)
    px = decode_bmp(header + bottom_row + top_row)
    want = np.array([[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], np.uint8)
    assert (px == want).all()
    assert encode_bmp(want) == header + bottom_row + top_row


def test_wav_golden_byte_literal_with_unknown_chunk():
    import struct

    from cuda_gis_smoothing_ray.stages.media import decode_wav

    samples = struct.pack("<4h", -2, -1, 0, 7)
    # an unknown odd-sized chunk ('junk', 3 bytes + pad) sits between fmt
    # and data: the parser must skip it via generic word-aligned walking
    body = (b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 22050, 44100, 2, 16)
            + b"junk" + struct.pack("<I", 3) + b"abc\x00"
            + b"data" + struct.pack("<I", 8) + samples)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    s, rate = decode_wav(payload)
    assert rate == 22050
    assert (s == np.array([-2, -1, 0, 7], np.int16)).all()


def test_synth_media_payload_values_match_formulas(sf_dir):
    from cuda_gis_smoothing_ray.stages.media import (
        _bmp_dims, _wav_params, decode_bmp, decode_wav, synth_media_table)

    rows = {r["media_id"]: r["payload"]
            for r in synth_media_table(sf_dir).take(6)}
    bmp_id = min(m for m in rows if m % 2 == 0)
    wav_id = min(m for m in rows if m % 2 == 1)

    w, h = _bmp_dims(bmp_id)
    px = decode_bmp(rows[bmp_id])
    assert px.shape == (h, w, 3)
    i = np.arange(h * w * 3, dtype=np.int64)
    assert (px.reshape(-1) == ((bmp_id * 31 + i * 7) % 256)).all()

    rate_want, n_want = _wav_params(wav_id)
    s, rate = decode_wav(rows[wav_id])
    assert rate == rate_want and len(s) == n_want
    i = np.arange(n_want, dtype=np.int64)
    assert (s == ((wav_id * 17 + i * 13) % 4096 - 2048).astype(np.int16)).all()


def test_media_resize_real_nearest_mapping():
    """Hand-verify the floor gather on one decoded BMP: resized[r,c,ch] must
    equal src[r*h//H, c*w//W, ch]."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.media import (
        _bmp_dims, encode_bmp, media_resize_real)

    mid = 4  # bmp id
    w, h = _bmp_dims(mid)
    i = np.arange(h * w * 3, dtype=np.int64)
    px = ((mid * 31 + i * 7) % 256).astype(np.uint8).reshape(h, w, 3)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([mid], pa.int64()),
        "fmt": pa.array(["bmp"], pa.string()),
        "payload": pa.array([encode_bmp(px)], pa.binary()),
    }))
    H, W = 12, 16
    row = media_resize_real(ds, target_w=W, target_h=H).take(1)[0]
    rs = np.arange(H, dtype=np.int64) * h // H
    cs = np.arange(W, dtype=np.int64) * w // W
    v = px[np.ix_(rs, cs)].reshape(-1).astype(np.int64)
    assert row["src_w"] == w and row["src_h"] == h
    assert row["n_units"] == H * W * 3
    assert row["v_sum"] == int(v.sum())
    assert row["checksum"] == int((np.arange(len(v)) * v).sum())


def test_audio_resample_real_nearest_mapping():
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.media import audio_resample_real, encode_wav

    s = np.array([10, -20, 30, -40, 50, -60], np.int16)
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "fmt": pa.array(["wav"], pa.string()),
        "payload": pa.array([encode_wav(s, 8000)], pa.binary()),
    }))
    row = audio_resample_real(ds, target_rate=16000).take(1)[0]
    # upsample 2x by nearest: each sample repeats twice
    want = np.repeat(s.astype(np.int64), 2)
    assert row["n_in"] == 6 and row["n_out"] == 12 and row["src_rate"] == 8000
    assert row["v_sum"] == int(want.sum())
    assert row["checksum"] == int((np.arange(12) * want).sum())


def test_rfm_segments_hand_math(ray_session):
    """3 users: terciles at rank floor((n-1)/3)=0 and floor(2(n-1)/3)=1 of
    each sorted dimension; labels compare by VALUE (3 = best)."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import rfm_segments

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = [
        # user 1: last day 10, 3 events, 2 purchases of 1.00 + 2.50
        (1, t0 + 10 * day, 1, "purchase", 1.0),
        (2, t0 + 9 * day, 1, "purchase", 2.5),
        (3, t0 + 8 * day, 1, "view", 99.0),      # non-purchase: no money
        # user 2: last day 4, 1 event, no purchase
        (4, t0 + 4 * day, 2, "view", 5.0),
        # user 3: last day 0, 2 events, one purchase of 0.40
        (5, t0, 3, "purchase", 0.4),
        (6, t0 - 3 * day, 3, "click", 0.0),
    ]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows]),
    })).repartition(2)
    out = rfm_segments(ds).to_pandas().sort_values("user_id").reset_index(drop=True)
    assert out["recency_days"].tolist() == [0, 6, 10]
    assert out["frequency"].tolist() == [3, 1, 2]
    assert out["monetary_cents"].tolist() == [350, 0, 40]
    # recency sorted [0,6,10] -> t1=0, t2=6: u1 d=0 ->3, u2 d=6 ->2, u3 d=10 ->1
    assert out["r_seg"].tolist() == [3, 2, 1]
    # frequency sorted [1,2,3] -> t1=1, t2=2: u1 f=3 ->3, u2 f=1 ->1, u3 f=2 ->2
    assert out["f_seg"].tolist() == [3, 1, 2]
    # money sorted [0,40,350] -> t1=0, t2=40: u1 ->3, u2 ->1, u3 ->2
    assert out["m_seg"].tolist() == [3, 1, 2]


def test_session_overlap_owner_bucket_exactly_once(ray_session):
    """Two sessions overlapping across MANY time buckets emit their pair
    exactly once; disjoint and same-user pairs don't appear; zero-length
    single-event sessions overlap when instantaneously concurrent."""
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import session_overlap

    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows = [
        # user 1 session 0: spans 0h..5h (events every 20min keep it alive)
        *[(100 + i, t0 + i * np.timedelta64(20, "m"), 1, "view", 0)
          for i in range(16)],
        # user 2 session 0: 2h..3h05 (25-min steps stay under the 30-min
        # gap) -> ONE session crossing the 2h->3h bucket boundary
        (200, t0 + 2 * h, 2, "view", 0),
        (201, t0 + 2 * h + np.timedelta64(25, "m"), 2, "view", 0),
        (203, t0 + 2 * h + np.timedelta64(50, "m"), 2, "view", 0),
        (204, t0 + 3 * h + np.timedelta64(5, "m"), 2, "view", 0),
        # user 2 session 1: 50h, disjoint from everything
        (202, t0 + 50 * h, 2, "view", 0),
        # user 3: single event exactly at user 2's session start
        (300, t0 + 2 * h, 3, "view", 0),
    ]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows]),
    })).repartition(3)
    out = session_overlap(ds).to_pandas() \
        .sort_values(["user_a", "sess_a", "user_b", "sess_b"]).reset_index(drop=True)
    got = list(zip(out["user_a"], out["sess_a"], out["user_b"], out["sess_b"]))
    assert got == [(1, 0, 2, 0), (1, 0, 3, 0), (2, 0, 3, 0)]
    # u1 x u2: 2h00..3h05 = 65 min, exactly ONCE despite spanning 2 buckets
    assert out["overlap_us"].tolist() == [65 * 60_000_000, 0, 0]


def test_cuped_lift_perfect_covariate():
    """When post-period spend equals pre-period spend exactly, theta = 1
    and the adjusted lift collapses to 0 even though the raw arm means
    differ — CUPED's defining property, hand-checkable."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import cuped_lift

    rngs = np.arange(1, 201, dtype=np.int64)
    vals = (rngs * 7 % 50 + 1).astype(np.float64)  # varied per-user spend
    pre_ts = np.full(200, np.datetime64("2024-01-01T00:00:00", "us"))
    post_ts = np.full(200, np.datetime64("2024-01-03T00:00:00", "us"))
    t = pa.table({
        "event_id": pa.array(np.arange(400, dtype=np.int64)),
        "user_id": pa.array(np.concatenate([rngs, rngs])),
        "ts": pa.array(np.concatenate([pre_ts, post_ts])),
        "value": pa.array(np.concatenate([vals, vals])),
    })
    out = cuped_lift(rd.from_arrow(t)).to_pandas()
    assert abs(float(out["theta"].iloc[0]) - 1.0) < 1e-9
    assert abs(float(out["lift_adj"].iloc[0])) < 1e-6
    # raw means differ across the hash arms (the case CUPED corrects)
    assert (abs(float(out["mean_raw_b"].iloc[0])
                - float(out["mean_raw_a"].iloc[0])) > 1e-6)
    # adjusted means both equal the global pre-period mean
    xbar = float((vals * 100).round().sum()) / 200
    assert abs(float(out["mean_adj_a"].iloc[0]) - xbar) < 1e-6
    assert abs(float(out["mean_adj_b"].iloc[0]) - xbar) < 1e-6


def test_als_rank1_recovers_rank1_structure():
    """Events built from an exactly rank-1 spend matrix R = outer(c, w):
    the learned item vector is proportional to w (within quantization),
    and is invariant to user scaling (direction only)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import als_rank1

    types = ["a", "b", "c", "d"]
    w = np.array([1.0, 2.0, 4.0, 8.0])
    cs = np.array([1.0, 3.0, 5.0])
    rows_u, rows_t, rows_v = [], [], []
    for i, cu in enumerate(cs):
        for j, t in enumerate(types):
            rows_u.append(i + 1)
            rows_t.append(t)
            rows_v.append(cu * w[j])
    n = len(rows_u)
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
        "ts": pa.array(np.full(n, np.datetime64("2024-01-01", "us"))),
        "event_type": pa.array(rows_t, pa.string()),
        "value": pa.array(np.array(rows_v, dtype=np.float64)),
    })
    out = als_rank1(rd.from_arrow(t)).to_pandas().set_index("event_type")
    v = out.loc[types, "v"].to_numpy(np.float64)
    ratios = v / w
    assert np.all(v > 0)
    assert ratios.max() / ratios.min() < 1.001  # direction == w


def test_km_survival_hand_curve():
    """Textbook KM hand case: 4 users — conversions at t=1h (x2) and
    t=3h, one censored at t=2h.  S(1)=1-2/4=0.5; at t=3 the censored
    user has left the risk set: S(3)=0.5*(1-1/1)=0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import km_survival

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rows = [
        # (user, ts_offset_hours, type)
        (1, 0, "view"), (1, 1, "purchase"),
        (2, 0, "view"), (2, 1, "purchase"),
        (3, 0, "view"), (3, 2, "view"),           # censored at t=2
        (4, 0, "view"), (4, 3, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
        "user_id": pa.array(np.array([r[0] for r in rows], np.int64)),
        "ts": pa.array([base + r[1] * H for r in rows]),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array(np.ones(len(rows))),
    })
    out = km_survival(rd.from_arrow(t)).to_pandas().set_index("t")
    assert list(out.index) == [1, 3]
    assert int(out.loc[1, "n_risk"]) == 4
    assert int(out.loc[1, "n_events"]) == 2
    assert abs(float(out.loc[1, "surv"]) - 0.5) < 1e-9
    assert int(out.loc[3, "n_risk"]) == 1     # censored user left at t=2
    assert float(out.loc[3, "surv"]) == 0.0


def test_seasonality_profile_dense_semantics():
    """Missing hours are zeros: a series spanning 48 hours with events
    only at hour-of-day 5 gives every slot n_hours=2 and means that
    divide by the FULL slot count, not just populated hours."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import seasonality_profile

    base = np.datetime64("2024-01-01T00:00:00", "us")  # midnight UTC
    H = np.timedelta64(1, "h")
    # anchor hours 0 and 47 so the dense span is exactly 48 slots
    ts = [base, base + 47 * H]
    ts += [base + 5 * H] * 6          # day 1, 05:00 -> 6 events
    ts += [base + 29 * H] * 2         # day 2, 05:00 -> 2 events
    ds = rd.from_arrow(pa.table({"ts": pa.array(ts)}))
    out = seasonality_profile(ds).to_pandas().set_index("how")
    assert (out["n_hours"] == 2).all()
    assert int(out.loc[5, "cnt_sum"]) == 8
    assert int(out.loc[5, "mean_micro"]) == 4_000_000
    assert int(out.loc[0, "cnt_sum"]) == 1    # the anchor event
    assert int(out.loc[12, "cnt_sum"]) == 0
    assert int(out.loc[12, "mean_micro"]) == 0


def test_cross_correlation_planted_lead():
    """Series b is exactly series a shifted by +2 hours: corr peaks at
    lag = +2 with value 1.0; m shrinks by |lag|."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import cross_correlation

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    rng = np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8], dtype=np.int64)
    ts, types = [], []
    for i, c in enumerate(rng):
        ts += [base + i * H] * int(c)
        types += ["click"] * int(c)
        ts += [base + (i + 2) * H] * int(c)
        types += ["purchase"] * int(c)
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts),
        "event_type": pa.array(types, pa.string()),
    }))
    out = cross_correlation(ds).to_pandas().set_index("lag")
    n = 14  # hours 0..13 (purchases extend 2 past clicks)
    assert int(out.loc[2, "m"]) == n - 2
    assert abs(float(out.loc[2, "corr"]) - 1.0) < 1e-6
    assert float(out.loc[2, "corr"]) > float(out.loc[0, "corr"])
    assert float(out.loc[2, "corr"]) > float(out.loc[-2, "corr"])


def test_markov_stationary_two_state_chain():
    """Hand chain: A->B always, B->A always — the stationary distribution
    is uniform; a chain biased 3:1 toward staying in A puts more mass on
    A than B."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import markov_stationary

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")

    def build(seq):
        return rd.from_arrow(pa.table({
            "event_id": pa.array(np.arange(len(seq), dtype=np.int64)),
            "user_id": pa.array(np.ones(len(seq), np.int64)),
            "ts": pa.array([base + i * H for i in range(len(seq))]),
            "event_type": pa.array(list(seq), pa.string()),
            "value": pa.array(np.ones(len(seq))),
        }))

    out = markov_stationary(build("ABABABABAB")).to_pandas() \
        .set_index("event_type")
    assert abs(int(out.loc["A", "pi"]) - int(out.loc["B", "pi"])) <= 1

    # A->A x3 for each A->B; B always returns to A
    biased = "AAABA" * 8
    o2 = markov_stationary(build(biased)).to_pandas().set_index("event_type")
    assert int(o2.loc["A", "pi"]) > 2 * int(o2.loc["B", "pi"])


def test_haar_energy_parseval_and_hand():
    """A constant series has zero energy at EVERY level (all pairs
    cancel); the unnormalized Parseval identity holds on a random
    series: sum_j energy_j / 2^j + (total)^2 / 2^L == sum x^2 (exact
    rationals — checked cleared of denominators)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import haar_energy

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")

    def build(counts):
        ts = []
        for i, c in enumerate(counts):
            ts += [base + i * H] * int(c)
        return rd.from_arrow(pa.table({"ts": pa.array(ts)}))

    L = 4
    const = haar_energy(build([3] * 16), levels=L).to_pandas()
    assert (const["energy"] == 0).all()

    x = np.array([3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3],
                 dtype=object)
    out = haar_energy(build(x), levels=L).to_pandas()
    # Parseval (unnormalized Haar): sum_j E_j * 2^(L-j) + total^2
    #   == 2^L * sum x^2
    lhs = sum(int(e) * (1 << (L - j))
              for j, e in zip(out["level"], out["energy"]))
    lhs += int(x.sum()) ** 2
    assert lhs == (1 << L) * int((x * x).sum())


def test_type_burstiness_poisson_vs_burst():
    """A perfectly regular type (1 event every hour) has fano = 0; a type
    with all events in one hour has fano ~ total (maximal burst); exact
    values hand-checked."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import type_burstiness

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    ts, types = [], []
    for i in range(16):             # regular: one per hour
        ts.append(base + i * H)
        types.append("steady")
    ts += [base + 3 * H] * 16       # bursty: all 16 in one hour
    types += ["burst"] * 16
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(ts), "event_type": pa.array(types, pa.string())}))
    out = type_burstiness(ds).to_pandas().set_index("event_type")
    assert (out["n_hours"] == 16).all()
    assert float(out.loc["steady", "fano"]) == 0.0
    # burst: n=16, S1=16, S2=256 -> (16*256 - 256) / (16*16) = 15.0
    assert abs(float(out.loc["burst", "fano"]) - 15.0) < 1e-9


def test_theil_sen_outlier_immunity():
    """A clean slope-2 daily series gives exactly slope 2; corrupting one
    day with a huge outlier leaves the Theil-Sen median unchanged (the
    defining robustness property) while the OLS slope would move."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import theil_sen_trend

    base = np.datetime64("2024-01-01T00:00:00", "us")
    DAY = np.timedelta64(1, "D").astype("timedelta64[us]")

    def build(counts):
        ts = []
        for i, c in enumerate(counts):
            ts += [base + i * DAY] * int(c)
        return rd.from_arrow(pa.table({"ts": pa.array(ts)}))

    clean = [2 * i + 3 for i in range(9)]
    out = theil_sen_trend(build(clean)).to_pandas()
    assert abs(float(out["slope"].iloc[0]) - 2.0) < 1e-9
    assert int(out["n_pairs"].iloc[0]) == 36

    dirty = list(clean)
    dirty[4] += 500  # one crawler-burst day
    o2 = theil_sen_trend(build(dirty)).to_pandas()
    assert abs(float(o2["slope"].iloc[0]) - 2.0) < 1e-9


def test_hot_runs_islands():
    """Hand series: two islands of above-mean hours with a gap — runs are
    (start, len) = exactly the islands; a run touching the series end
    closes properly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import hot_runs

    base = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(1, "h")
    # counts per hour: [9, 9, 1, 1, 9, 9, 9] -> mean 47/7 ~ 6.7
    counts = [9, 9, 1, 1, 9, 9, 9]
    ts = []
    for i, c in enumerate(counts):
        ts += [base + i * H] * c
    out = hot_runs(rd.from_arrow(
        pa.table({"ts": pa.array(ts)}))).to_pandas()
    h0 = int(np.datetime64("2024-01-01T00", "h").astype(np.int64))
    got = list(zip(out["run_start"], out["run_len"]))
    assert got == [(h0, 2), (h0 + 4, 3)]


def test_mann_kendall_trend_and_flat():
    """A strictly increasing daily series: S = D(D-1)/2 (max), z > 0; a
    constant series: S = 0, variance fully eaten by the single tie group
    (var18 = 0) -> z = 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import mann_kendall

    base = np.datetime64("2024-01-01T00:00:00", "us")
    DAY = np.timedelta64(1, "D").astype("timedelta64[us]")

    def build(counts):
        ts = []
        for i, c in enumerate(counts):
            ts += [base + i * DAY] * int(c)
        return rd.from_arrow(pa.table({"ts": pa.array(ts)}))

    up = mann_kendall(build([i + 1 for i in range(10)])).to_pandas()
    assert int(up["s"].iloc[0]) == 45
    assert float(up["z"].iloc[0]) > 2.0

    flat = mann_kendall(build([7] * 10)).to_pandas()
    assert int(flat["s"].iloc[0]) == 0
    assert int(flat["var18"].iloc[0]) == 0
    assert float(flat["z"].iloc[0]) == 0.0


def test_dft_power24_pure_diurnal():
    """A perfectly diurnal stream (all events at hour-of-day 0) has
    amp_ratio 1.0 at every harmonic; a uniform one over a full day has
    ~0 at harmonic 1."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import dft_power24

    day0 = np.datetime64("2024-01-01T00:00:00", "us")
    spike = [day0 + np.timedelta64(24 * 3600 * 10**6 * d, "us")
             for d in range(4)]
    t = pa.table({"ts": pa.array(spike, pa.timestamp("us"))})
    out = dft_power24(rd.from_arrow(t)).to_pandas()
    assert (out["amp_ratio"] == 1.0).all()

    flat = [day0 + np.timedelta64(3600 * 10**6 * h, "us") for h in range(24)]
    t2 = pa.table({"ts": pa.array(flat, pa.timestamp("us"))})
    out2 = dft_power24(rd.from_arrow(t2)).to_pandas().set_index("harmonic")
    # exact-integer table sums cancel to ~0 (quantization residue only)
    assert float(out2.loc[1, "amp_ratio"]) < 1e-4


def test_holt_linear_exact_line_and_float_parity():
    """On an exact arithmetic progression Holt locks on: level = last
    value, trend = the step, forecast extrapolates; and the scaled-int
    recursion equals a direct float recursion to round6 precision."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import holt_linear

    day0 = np.datetime64("2024-01-01T12:00:00", "us")
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    # counts per day: 1, 2, 3, 4, 5  (perfect line, step 1)
    ts = [day0 + d * DAY for d in range(5) for _ in range(d + 1)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = holt_linear(rd.from_arrow(t)).to_pandas()
    assert int(out["n_days"].iloc[0]) == 5
    assert float(out["level"].iloc[0]) == 5.0
    assert float(out["trend"].iloc[0]) == 1.0
    assert float(out["forecast"].iloc[0]) == 6.0

    # float-recursion parity on a bumpy series
    y = [3, 0, 7, 2, 2, 9]
    ts2 = [day0 + d * DAY for d, c in enumerate(y) for _ in range(c)]
    out2 = holt_linear(rd.from_arrow(
        pa.table({"ts": pa.array(ts2, pa.timestamp("us"))}))).to_pandas()
    l, b = float(y[0]), float(y[1] - y[0])
    for v in y[1:]:
        l_new = (v + l + b) / 2
        b = (l_new - l + b) / 2
        l = l_new
    assert abs(float(out2["level"].iloc[0]) - l) < 1e-6
    assert abs(float(out2["forecast"].iloc[0]) - (l + b)) < 1e-6


def test_trigram_transitions_hand():
    """Triples never cross user boundaries; counts and support prune."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import trigram_transitions

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(10**6, "us")
    rows = [
        # user 1: a b c a b c  -> abc x2, bca, cab
        *[(1, i, ty) for i, ty in enumerate("abcabc")],
        # user 2: b c (too short for a triple with user 1's tail)
        (2, 10, "b"), (2, 11, "c"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([t0 + r[1] * S for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = trigram_transitions(rd.from_arrow(t), min_n=2).to_pandas()
    assert len(out) == 1
    assert tuple(out.iloc[0][["t1", "t2", "t3"]]) == ("a", "b", "c")
    assert int(out["n"].iloc[0]) == 2


def test_mad_outlier_days_robust_to_one_spike():
    """One huge day is flagged (MAD ignores it), while mean+sigma logic
    would be dragged; quiet days stay unflagged."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import mad_outlier_days

    day0 = np.datetime64("2024-01-01T00:00:00", "us")
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    y = [5, 6, 5, 7, 200, 6, 5]  # day 4 is the anomaly
    ts = [day0 + d * DAY for d, c in enumerate(y) for _ in range(c)]
    out = mad_outlier_days(rd.from_arrow(
        pa.table({"ts": pa.array(ts, pa.timestamp("us"))}))).to_pandas()
    assert len(out) == 1
    assert int(out["cnt"].iloc[0]) == 200
    assert int(out["med"].iloc[0]) == 6
    assert int(out["mad"].iloc[0]) == 1


def test_path_entropy_bounds():
    """Single-type user has 0 entropy; a uniform 4-type user has
    ln(4) micro-nats (up to per-term quantization)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import path_entropy

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(1, "a")] * 5 + [(2, t) for t in "abcd" * 2]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
    })
    out = path_entropy(rd.from_arrow(t)).to_pandas().set_index("user_id")
    assert int(out.loc[1, "h_micro"]) == 0
    assert int(out.loc[1, "n_types"]) == 1
    assert abs(int(out.loc[2, "h_micro"]) - round(np.log(4) * 1e6)) <= 4


def test_event_doc_join_hand(tmp_path):
    """props k joins to the documents dim; unmatched k drops; cents are
    exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import event_doc_join

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "lang": pa.array(["en", "de"]),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    ev = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "props": pa.array(['{"k": 0}', '{"k": 0}', '{"k": 1}',
                           '{"k": 99}']),
        "value": pa.array([1.01, 2.0, 3.5, 100.0], pa.float64()),
    })
    out = event_doc_join(rd.from_arrow(ev), str(tmp_path)).to_pandas() \
        .set_index("lang")
    assert int(out.loc["en", "n_events"]) == 2
    assert int(out.loc["en", "n_docs"]) == 1
    assert int(out.loc["en", "sum_cents"]) == 101 + 200
    assert int(out.loc["de", "sum_cents"]) == 350
    assert "99" not in out.index


def test_transition_dwell_hand():
    """Gaps attach to the (from, to) pair; floor-division mean."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import transition_dwell

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(10**6, "us")
    # user 1: a --3s--> b --5s--> a ; user 2: a --2s--> b
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([t0, t0 + 3 * S, t0 + 8 * S, t0, t0 + 2 * S],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "a", "b"]),
    })
    out = transition_dwell(rd.from_arrow(t)).to_pandas() \
        .set_index(["from_type", "to_type"])
    assert int(out.loc[("a", "b"), "n"]) == 2
    assert int(out.loc[("a", "b"), "total_gap_us"]) == 5 * 10**6
    assert int(out.loc[("a", "b"), "mean_gap_us"]) == 2_500_000
    assert int(out.loc[("b", "a"), "total_gap_us"]) == 5 * 10**6


def test_active_time_union():
    """Clustered events do not double count; a gap > window opens a new
    span."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import active_time

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(60 * 10**6, "us")  # one minute
    # user 1: events at 0,1,2 min (one span: 2min + 5min window)
    #         then at 60 min (second span: 0 + 5)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([t0, t0 + M, t0 + 2 * M, t0 + 60 * M],
                       pa.timestamp("us")),
        "event_type": pa.array(["a"] * 4),
    })
    out = active_time(rd.from_arrow(t)).to_pandas()
    assert int(out["n_spans"].iloc[0]) == 2
    want = (2 * 60 + 5 * 60) * 10**6 + 5 * 60 * 10**6
    assert int(out["active_us"].iloc[0]) == want


def test_bounce_rate_hand():
    """Single-event sessions count as bounces, keyed by start day."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import bounce_rate

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600 * 10**6, "us")
    # user 1: two events 1 min apart (one session, not a bounce)
    # user 2: one event (bounce), next day another single event (bounce)
    t = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([t0, t0 + np.timedelta64(60 * 10**6, "us"),
                        t0 + H, t0 + 30 * H], pa.timestamp("us")),
        "event_type": pa.array(["a"] * 4),
    })
    out = bounce_rate(rd.from_arrow(t)).to_pandas().set_index("day")
    d0 = int(t0.astype("datetime64[D]").astype(int))
    assert int(out.loc[d0, "n_sessions"]) == 2
    assert int(out.loc[d0, "n_bounce"]) == 1
    assert float(out.loc[d0, "rate"]) == 0.5
    assert int(out.loc[d0 + 1, "n_bounce"]) == 1


def test_returning_users_hand():
    """A user active two consecutive days counts as returning on day 2;
    a gap day breaks the streak."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import returning_users

    t0 = np.datetime64("2024-01-01T10:00:00", "us")
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    # user 1: days 0, 1, 3 ; user 2: day 1 only
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([t0, t0 + DAY, t0 + 3 * DAY, t0 + DAY],
                       pa.timestamp("us")),
        "event_type": pa.array(["a"] * 4),
    })
    out = returning_users(rd.from_arrow(t)).to_pandas().set_index("day")
    d0 = int(t0.astype("datetime64[D]").astype(int))
    assert int(out.loc[d0, "dau"]) == 1
    assert int(out.loc[d0, "ret_users"]) == 0
    assert int(out.loc[d0 + 1, "dau"]) == 2
    assert int(out.loc[d0 + 1, "ret_users"]) == 1
    assert float(out.loc[d0 + 1, "rate"]) == 0.5
    assert int(out.loc[d0 + 3, "ret_users"]) == 0


def test_decayed_counts_half_life():
    """An event one half-life old weighs exactly half; very old events
    saturate at the 40-shift floor."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import decayed_counts

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    H12 = np.timedelta64(12 * 3600 * 10**6, "us")
    t = pa.table({
        "event_type": pa.array(["a", "a", "a"]),
        "ts": pa.array([t0 + 2 * H12, t0 + H12, t0], pa.timestamp("us")),
    })
    out = decayed_counts(rd.from_arrow(t)).to_pandas()
    # newest: 1e6, one half-life: 5e5, two: 2.5e5
    assert int(out["decayed_micro"].iloc[0]) == 10**6 + 500_000 + 250_000
    assert int(out["n"].iloc[0]) == 3


def test_spend_gini_bounds():
    """Equal spenders give gini 0; one dominant spender pushes it near
    (n-1)/n."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import spend_gini

    def ev(vals):
        return rd.from_arrow(pa.table({
            "user_id": pa.array(list(range(len(vals))), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }))

    eq = spend_gini(ev([5.0] * 10)).to_pandas()
    assert float(eq["gini"].iloc[0]) == 0.0
    dom = spend_gini(ev([0.01] * 9 + [10000.0])).to_pandas()
    assert float(dom["gini"].iloc[0]) > 0.85


def test_type_drift_days_flags_anomalous_day():
    """A day whose mix matches the global scores ~0; a flipped-mix day
    scores high."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import type_drift_days

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    rows = []
    # days 0,1: 9 a + 1 b each; day 2: 1 a + 9 b (the drifted day)
    for d, (na, nb) in enumerate([(9, 1), (9, 1), (1, 9)]):
        rows += [(d, "a")] * na + [(d, "b")] * nb
    t = pa.table({
        "ts": pa.array([t0 + r[0] * DAY for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
    })
    out = type_drift_days(rd.from_arrow(t)).to_pandas()
    chi = out["chi2"].to_numpy()
    # the global mix includes the drifted day, so normal days
    # deviate a little too; the flipped day still dominates
    assert chi[2] > 3 * max(chi[0], chi[1])


def test_spend_rate_hand():
    """cents / active seconds with the window tail included."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import spend_rate

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    M = np.timedelta64(60 * 10**6, "us")
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([t0, t0 + M], pa.timestamp("us")),
        "value": pa.array([2.0, 1.0], pa.float64()),
    })
    out = spend_rate(rd.from_arrow(t)).to_pandas()
    # one span: 60 s + 300 s window = 360 s; 300 cents -> 300/360
    assert int(out["cents"].iloc[0]) == 300
    assert int(out["active_us"].iloc[0]) == 360 * 10**6
    assert abs(float(out["rate"].iloc[0]) - 300 / 360) < 1e-6


def test_entry_paths_grouping():
    """Users sharing the first-3 sequence group; short users keep their
    truncated path; singletons drop."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import entry_paths

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    S = np.timedelta64(10**6, "us")
    rows = []
    for u, seq in [(1, "abc"), (2, "abc"), (3, "abd"), (4, "ab"),
                   (5, "ab")]:
        for i, ty in enumerate(seq):
            rows.append((u, i, ty))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([t0 + r[1] * S for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = entry_paths(rd.from_arrow(t)).to_pandas().set_index("path")
    assert int(out.loc["a,b,c", "n_users"]) == 2
    assert int(out.loc["a,b,c", "min_user"]) == 1
    assert int(out.loc["a,b", "n_users"]) == 2
    assert "a,b,d" not in out.index  # singleton dropped


def test_weekend_lift_normalization():
    """A type with equal per-day intensity has lift 1 even when the
    range holds more weekdays than weekend days."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import weekend_lift

    # 1970-01-05 is a Monday (epoch day 4). Days 4..10 = Mon..Sun.
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    t0 = np.datetime64("1970-01-05T00:00:00", "us")
    ts, types = [], []
    for d in range(7):  # 2 events per day, every day
        for _ in range(2):
            ts.append(t0 + d * DAY)
            types.append("a")
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": pa.array(types)})
    out = weekend_lift(rd.from_arrow(t)).to_pandas()
    assert int(out["n_weekday"].iloc[0]) == 10
    assert int(out["n_weekend"].iloc[0]) == 4
    assert float(out["lift"].iloc[0]) == 1.0


def test_spend_outliers_self_normalized():
    """A $100 event flags for a $1-spender but not for a whale whose
    history makes it routine."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import spend_outliers

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    # user 1: 20 small + one 100 -> outlier (note: a lone spike among
    # n equal values has z^2 = n-1 exactly, so n must exceed k^2+1)
    rows += [(1, i, 1.0) for i in range(20)] + [(1, 20, 100.0)]
    # user 2: values 90..109 -> 100 is routine
    rows += [(2, 30 + i, 90.0 + i) for i in range(20)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })
    out = spend_outliers(rd.from_arrow(t)).to_pandas()
    assert out["event_id"].tolist() == [20]
    assert int(out["cents"].iloc[0]) == 10000


def test_top_type_share_tie_rule():
    """Count ties resolve to the lexically smallest type; shares are
    exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import top_type_share

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(1, "b"), (1, "b"), (1, "a"), (1, "a"),  # tie -> 'a'
            (2, "x"), (2, "x"), (2, "y")]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array([t0] * len(rows), pa.timestamp("us")),
        "event_type": pa.array([r[1] for r in rows]),
    })
    out = top_type_share(rd.from_arrow(t)).to_pandas().set_index("user_id")
    assert out.loc[1, "top_type"] == "a"
    assert float(out.loc[1, "share"]) == 0.5
    assert out.loc[2, "top_type"] == "x"
    assert abs(float(out.loc[2, "share"]) - 2 / 3) < 1e-6


def test_wau_curve_window_dedup():
    """A user active twice inside one window counts once; activity ages
    out after `window` days."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.events import wau_curve

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    DAY = np.timedelta64(24 * 3600 * 10**6, "us")
    # user 1 active day 0 and day 2; user 2 active day 9 only
    t = pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([t0, t0 + 2 * DAY, t0 + 9 * DAY],
                       pa.timestamp("us")),
        "event_type": pa.array(["a"] * 3),
    })
    out = wau_curve(rd.from_arrow(t)).to_pandas().set_index("day")
    d0 = int(t0.astype("datetime64[D]").astype(int))
    assert int(out.loc[d0 + 2, "wau"]) == 1        # both activities, one user
    assert int(out.loc[d0 + 6, "wau"]) == 1        # day 0 aged out, day 2 in
    assert int(out.loc[d0 + 8, "wau"]) == 1        # day-2 activity still in
    assert int(out.loc[d0 + 9, "wau"]) == 1        # user 1 aged out; user 2 in


def test_audio_loudness_hand(ray_session):
    """Hand WAV fixtures through the REAL encoder/decoder: samples
    [3,-4,0] -> sum_sq 25, peak 4, rms_db = 10*log10(25/(3*2048^2));
    all-silence [0,0] clamps sum_sq to 1 in the dB only."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from cuda_gis_smoothing_ray.stages.media import audio_loudness, encode_wav

    ds = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "fmt": pa.array(["wav", "wav"], pa.string()),
        "payload": pa.array([
            encode_wav(np.array([3, -4, 0], np.int16), 8000),
            encode_wav(np.array([0, 0], np.int16), 16000),
        ], pa.binary()),
    }))
    got = audio_loudness(ds).to_pandas().sort_values("media_id") \
        .reset_index(drop=True)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert got["sample_rate"].to_list() == [8000, 16000]
    assert got["n_samples"].to_list() == [3, 2]
    assert got["peak"].to_list() == [4, 0]
    assert got["sum_sq"].to_list() == [25, 0]
    assert got["rms_db"].to_list() == [
        r6(10.0 * math.log10(25 / (3 * 4194304))),
        r6(10.0 * math.log10(1 / (2 * 4194304))),
    ]
