"""Telemetry: report schemas match the reference's checked-in artifacts."""

import json
import os
import time

import pytest

from facerecognitionpipeline_tpu.telemetry.monitor import (
    PerformanceMonitorClient,
    PerformanceMonitorServer,
)

REF_SERVER_REPORT = (
    "/root/reference/sessions/performance_adaface_ir101_test/"
    "performance_report_server.json"
)
REF_CLIENT_REPORT = (
    "/root/reference/sessions/performance_adaface_ir101_test/"
    "performance_report_client.json"
)


def _keys(d, prefix=""):
    out = set()
    for k, v in d.items():
        path = f"{prefix}.{k}" if prefix else k
        out.add(path)
        if isinstance(v, dict):
            out |= _keys(v, path)
    return out


def _exercise_server(tmp_path):
    mon = PerformanceMonitorServer(
        model_identifier="TEST", session_name="t", output_dir=str(tmp_path)
    )
    for _ in range(3):
        t = mon.start_request()
        mon.mark_recognition_start(t)
        time.sleep(0.001)
        mon.mark_recognition_end(t)
        mon.end_request(t, num_faces_processed=2, num_faces_recognized=1,
                        num_faces_unknown=1)
    return mon


def test_server_report_schema_superset_of_reference(tmp_path):
    mon = _exercise_server(tmp_path)
    report = mon.finalize_session(client_report={"session_info": {}})
    if os.path.exists(REF_SERVER_REPORT):
        with open(REF_SERVER_REPORT) as f:
            ref = json.load(f)
        missing = _keys(ref) - _keys(report)
        # our reports must contain every key a reference consumer reads
        assert not missing, f"missing reference report keys: {missing}"
    # files written
    assert (tmp_path / "performance_report_server.json").exists()
    assert (tmp_path / "performance_report_client.json").exists()
    assert report["request_statistics"]["total_requests_processed"] == 3
    assert report["request_statistics"]["recognition_rate"] == pytest.approx(0.5)
    assert report["latency_metrics"]["recognition"]["average_ms"] > 0


def test_client_report_schema_superset_of_reference(tmp_path):
    mon = PerformanceMonitorClient(session_name="c", output_dir=str(tmp_path))
    for i in range(35):  # crosses the 30-frame fps-history boundary
        t = mon.start_frame()
        mon.mark_capture_end(t)
        mon.mark_detection_end(t)
        mon.mark_network_start(t)
        mon.mark_network_end(t)
        mon.end_frame(t, num_faces_detected=1, network_request_sent=True)
    report = mon.finalize_session()
    if os.path.exists(REF_CLIENT_REPORT):
        with open(REF_CLIENT_REPORT) as f:
            ref = json.load(f)
        # fps_history entries are list-typed; compare dict keys only
        missing = {
            k for k in _keys(ref) - _keys(report) if "fps_history" not in k
        }
        assert not missing, f"missing reference report keys: {missing}"
    assert report["frame_statistics"]["total_frames_processed"] == 35
    assert report["fps_metrics"]["fps_history"]  # rolled over at frame 30
    assert (tmp_path / "performance_report_client_temp.json").exists()


def test_current_stats(tmp_path):
    mon = _exercise_server(tmp_path)
    stats = mon.get_current_stats()
    assert stats["total_requests"] == 3
    assert stats["avg_latency_recognition_ms"] > 0

    cmon = PerformanceMonitorClient(session_name="c2", output_dir=str(tmp_path))
    t = cmon.start_frame()
    cmon.end_frame(t)
    assert cmon.get_current_stats()["total_frames"] == 1
