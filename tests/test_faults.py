"""Chaos test: the client/server pair survives injected frame faults."""

import threading

import numpy as np
import pytest
import requests

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.serve.client import FaceRecognitionClient
from facerecognitionpipeline_tpu.serve.server import FaceRecognitionServer, serve
from facerecognitionpipeline_tpu.telemetry.faults import FaultPlan, FaultyClientTransport
from tests.test_server import FakeEngine


def test_client_survives_faulty_transport(tmp_path, rng):
    gallery = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    emb = rng.normal(size=(1, 512)).astype(np.float32)
    gallery.add_student("S1", "One", emb / np.linalg.norm(emb))
    srv = FaceRecognitionServer(
        gallery=gallery, output_dir=str(tmp_path / "sessions"),
        engine=FakeEngine(gallery),
    )
    httpd = serve(srv, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        client = FaceRecognitionClient(
            server_url=f"http://127.0.0.1:{port}",
            session_name="chaos",
            synthetic=True,
            frame_skip=1,
            max_frames=12,
            display=False,
            output_dir=str(tmp_path / "client"),
        )
        plan = FaultPlan(drop_rate=0.3, corrupt_rate=0.2, delay_rate=0.2,
                         delay_seconds=0.01, seed=1)
        client._requests = FaultyClientTransport(requests, plan)

        # must complete despite drops/corruption: per-frame errors are caught
        assert client.run() == 0
        stats = plan.stats()
        assert stats["dropped"] + stats["corrupted"] > 0  # faults really fired
        # some frames still got through and the session finalized
        session_dir = tmp_path / "sessions" / "chaos"
        assert (session_dir / "session.json").exists()
        import json

        with open(session_dir / "session.json") as f:
            sess = json.load(f)
        assert sess["status"] == "completed"
        assert srv.perf_monitor.total_requests >= 1
    finally:
        httpd.shutdown()
        srv.shutdown()
