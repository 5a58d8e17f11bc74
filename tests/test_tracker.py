"""Tracking state machines: SimpleTracker, FrameAccumulator, LiveRecognitionTracker."""

import json
import os
import time

import numpy as np
import pytest

from facerecognitionpipeline_tpu.serve.tracker import (
    FrameAccumulator,
    LiveRecognitionTracker,
    SimpleTracker,
)


def _det(x, y, size=80, score=0.9):
    return {"bbox": np.array([x, y, x + size, y + size], float), "det_score": score}


def test_simple_tracker_maintains_identity():
    t = SimpleTracker(max_distance=50)
    r1 = t.update([_det(100, 100), _det(400, 100)])
    ids1 = sorted(tid for tid, _ in r1)
    assert ids1 == [1, 2]
    # small motion keeps ids
    r2 = t.update([_det(110, 105), _det(395, 102)])
    ids2 = sorted(tid for tid, _ in r2)
    assert ids2 == ids1
    # a far-away detection becomes a new track
    r3 = t.update([_det(112, 106), _det(396, 104), _det(250, 300)])
    assert len(r3) == 3
    assert max(tid for tid, _ in r3) == 3


def test_simple_tracker_disappearance_gc():
    t = SimpleTracker(max_disappeared=2, max_distance=50)
    t.update([_det(100, 100)])
    for _ in range(3):
        t.update([])
    assert not t.tracks
    # reappearing face gets a fresh id
    r = t.update([_det(100, 100)])
    assert r[0][0] == 2


def test_simple_tracker_iou():
    t = SimpleTracker()
    assert t.compute_iou([0, 0, 10, 10], [0, 0, 10, 10]) == pytest.approx(1.0)
    assert t.compute_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0


def _face_dict(det=0.9, blur=150.0, yaw=5.0):
    return {
        "det_score": det,
        "aligned_face": np.zeros((112, 112, 3), np.uint8),
        "quality_metrics": {"blur_score": blur, "yaw": yaw, "pitch": 0.0, "roll": 0.0},
    }


def test_frame_accumulator_quality_and_save(tmp_path):
    acc = FrameAccumulator(target_frames=3, min_quality_score=0.5,
                           output_dir=str(tmp_path))
    q = acc.compute_quality_score(_face_dict())
    assert 0.5 < q <= 1.0
    # low-quality frames rejected
    assert not acc.add_frame(1, _face_dict(det=0.1, blur=5.0, yaw=80.0))
    assert acc.get_status(1) == "0/3"
    for _ in range(2):
        assert not acc.add_frame(1, _face_dict())
    assert acc.add_frame(1, _face_dict())  # completes at 3
    assert acc.get_status(1) == "completed"
    track_dir = tmp_path / "track_001"
    assert (track_dir / "metadata.json").exists()
    with open(track_dir / "metadata.json") as f:
        meta = json.load(f)
    assert meta["num_frames"] == 3
    assert len(meta["files"]) == 3
    assert all(os.path.exists(track_dir / fn) for fn in meta["files"])
    # further adds are no-ops
    assert acc.add_frame(1, _face_dict())


def test_live_tracker_gating_and_cooldown():
    lt = LiveRecognitionTracker(max_attempts=2, buffer_size=5, retry_cooldown=0.2)
    assert not lt.should_recognize(1)  # no frames yet
    lt.add_frame(1, _face_dict(det=0.5), "2026-01-01T00:00:00")
    assert not lt.should_recognize(1)  # det too low
    lt.add_frame(1, _face_dict(det=0.9), "2026-01-01T00:00:01")
    assert lt.should_recognize(1)

    lt.increment_attempts(1)
    lt.increment_attempts(1)
    # attempts exhausted -> enters cooldown
    assert not lt.should_recognize(1)
    assert lt.is_track_in_cooldown(1)
    time.sleep(0.25)
    # cooldown expiry resets attempts and clears the buffer
    assert not lt.is_track_in_cooldown(1)
    assert lt.recognition_attempts[1] == 0
    assert len(lt.track_frame_buffers[1]) == 0

    # recognized tracks are never re-attempted
    lt.add_frame(2, _face_dict(det=0.9), "2026-01-01T00:00:02")
    lt.mark_recognized(2, {"name": "X"})
    assert not lt.should_recognize(2)


def test_live_tracker_best_frame_and_duration():
    lt = LiveRecognitionTracker()
    lt.add_frame(1, _face_dict(det=0.7, blur=50), "2026-01-01T00:00:00")
    lt.add_frame(1, _face_dict(det=0.9, blur=200), "2026-01-01T00:00:10")
    best = lt.get_best_frame(1)
    assert best["det_score"] == 0.9
    assert lt.get_track_duration(1) == pytest.approx(10.0)
    assert lt.get_best_frame(99) is None


def test_live_tracker_cleanup_stale():
    lt = LiveRecognitionTracker()
    # Client timestamps are ancient, but aging is by SERVER monotonic time:
    # client clock skew must not drop live track state.
    lt.add_frame(1, _face_dict(), "2020-01-01T00:00:00")
    lt.add_frame(2, _face_dict(), "2020-01-01T00:00:00")
    lt.cleanup_stale_tracks(active_track_ids=[], max_age_seconds=30)
    assert 1 in lt.track_frame_buffers and 2 in lt.track_frame_buffers
    # Age track 1 past the horizon server-side; inactive+stale -> dropped.
    lt._last_seen_monotonic[1] -= 31
    lt.cleanup_stale_tracks(active_track_ids=[2], max_age_seconds=30)
    assert 1 not in lt.track_frame_buffers
    assert 1 not in lt._last_seen_monotonic
    assert 2 in lt.track_frame_buffers


def test_live_frame_interval_gating():
    """The live-app tracker variant: attempt only every Nth frame, attempts
    permanent (reference face_recognition_live.py:30-41)."""
    import math

    from facerecognitionpipeline_tpu.serve.tracker import LiveRecognitionTracker

    t = LiveRecognitionTracker(
        recognition_interval=30, max_attempts=3,
        retry_cooldown=math.inf, frame_interval_gating=True,
    )
    t.add_frame(1, {"det_score": 0.9, "quality_metrics": {"blur_score": 120}},
                "2026-08-17T00:00:00")
    # off-interval frames never attempt, regardless of buffer quality
    assert not t.should_recognize(1, frame_count=7)
    assert not t.should_recognize(1, frame_count=31)
    # on-interval frames do
    assert t.should_recognize(1, frame_count=30)
    assert t.should_recognize(1, frame_count=60)
    # attempts are PERMANENT: after max_attempts, never again (no cooldown reset)
    for _ in range(3):
        t.increment_attempts(1)
    assert not t.should_recognize(1, frame_count=90)
    assert not t.should_recognize(1, frame_count=120)


def test_mark_recognized_stores_a_copy():
    """The server mutates its rec_result on the disk-I/O path after marking
    (saved_face_path insert, _first_seen/_duration pops) while other frames
    iterate recognized_tracks building responses — the tracker must own an
    independent dict."""
    from facerecognitionpipeline_tpu.serve.tracker import LiveRecognitionTracker

    t = LiveRecognitionTracker()
    info = {"student_id": "S1", "name": "A", "confidence": 0.9, "track_id": 1}
    t.mark_recognized(1, info)
    info["saved_face_path"] = "/tmp/x.png"
    info.pop("confidence")
    stored = t.recognized_tracks[1]
    assert "saved_face_path" not in stored
    assert stored["confidence"] == 0.9


def test_track_duration_survives_malformed_timestamp():
    from facerecognitionpipeline_tpu.serve.tracker import LiveRecognitionTracker

    t = LiveRecognitionTracker()
    t.add_frame(5, {"det_score": 0.9, "quality_metrics": {}}, "16:92:00 bogus")
    assert t.get_track_duration(5) == 0.0
