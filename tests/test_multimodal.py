"""Multimodal plumbing: binary payload columns + Arrow-batched feature
extraction (decode stubbed with the deterministic fake)."""

from __future__ import annotations

import pytest

from etl_mudah_spark.operators.multimodal import (
    decode_image,
    fake_decode,
    frame_sample_plan,
    media_features,
)
from etl_mudah_spark.schemas import MEDIA_ASSETS

ROWS = [
    (1, 10, "image", b"\x89PNG fake bytes", 32, 16, None, None),
    (2, 10, "image", b"other payload", 8, 8, None, None),
    (3, 11, "video", b"\x00\x00mp4", 640, 480, 3500, "h264"),
    (4, 12, "audio", b"RIFF", None, None, 2000, "pcm"),
]


@pytest.fixture(scope="module")
def assets(spark):
    return spark.createDataFrame(ROWS, MEDIA_ASSETS)


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"x", 4, 4)


def test_fake_decode_deterministic():
    a = fake_decode(b"payload", 8, 8)
    b = fake_decode(b"payload", 8, 8)
    assert (a == b).all() and a.shape == (8, 8)
    assert (fake_decode(b"different", 8, 8) != a).any()


def test_media_features_over_arrow_batches(spark, assets):
    out = media_features(assets).orderBy("asset_id").collect()
    assert [r.asset_id for r in out] == [1, 2, 3, 4]
    r1 = out[0]
    assert r1.n_bytes == len(ROWS[0][3])
    assert 0.0 <= r1.feat_mean <= 1.0 and r1.thumb_w == 8 and r1.thumb_h == 8
    # determinism across runs
    again = media_features(assets).orderBy("asset_id").collect()
    assert [r.feat_mean for r in again] == [r.feat_mean for r in out]


def test_frame_sample_plan(spark, assets):
    frames = frame_sample_plan(assets, every_ms=1000).collect()
    # only the video row explodes; 3500 ms @ 1 Hz → ts 0,1000,2000,3000
    assert {r.asset_id for r in frames} == {3}
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]


def test_audio_window_plan_covers_duration_with_overlap(assets):
    from etl_mudah_spark.operators.multimodal import audio_window_plan

    # non-overlapping: 2000ms / 500ms -> 4 full windows for asset 4
    wins = audio_window_plan(assets, window_ms=500).collect()
    assert [r["asset_id"] for r in wins] == [4] * 4
    assert [r["win_start_ms"] for r in wins] == [0, 500, 1000, 1500]
    assert all(r["win_len_ms"] == 500 for r in wins)

    # overlapped STFT framing: hop 250 -> 8 windows, last one short
    lapped = audio_window_plan(assets, window_ms=500, hop_ms=250).collect()
    assert len(lapped) == 8
    assert lapped[-1]["win_start_ms"] == 1750 and lapped[-1]["win_len_ms"] == 250
    # only audio assets window; plan is pure Column algebra (no Python)
    df = audio_window_plan(assets, window_ms=500)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
