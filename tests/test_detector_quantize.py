"""Int8 detector cascade: parity + round-trip guarantees (VERDICT r3 #1).

The R/O-net convs/fc of the MTCNN cascade carry its FLOPs; quantize='int8'
swaps them for static-scale int8 QuantConv/QuantDense with activation scales
calibrated on full cascade intermediates (models/detector.py::calibrate_amax,
models/quantize.py::quantize_detector_variables). These tests pin what the
VERDICT asked for: detection parity (stress-suite AP unchanged, box/landmark
drift bounded) and a save/load round-trip that preserves the quantized
numerics bit-exactly.

Reference capability: `/root/reference/face_recognition.py:31-48` runs SCRFD
float-only; quantization of the detection path is beyond-reference.
"""

import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.evalharness.detection import (
    evaluate_detector_category,
    iou_matrix,
    render_stress_scene,
)
from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pretrained", "mtcnn_synthetic.npz",
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="shipped weights not present"
)

KW = dict(
    det_size=(320, 320), max_faces=32, min_face_size=18,
    weights_path=WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
)


@pytest.fixture(scope="module")
def det_float():
    return MTCNNDetector(**KW)


@pytest.fixture(scope="module")
def det_int8():
    return MTCNNDetector(**KW, quantize="int8")


def test_quantized_tree_layout(det_int8):
    """R/O-net FLOP carriers are int8; P-net and the heads stay float."""
    assert det_int8.quantized
    v = det_int8.variables
    for net, convs in (("rnet", ["conv1", "conv2", "conv3", "fc1"]),
                       ("onet", ["conv1", "conv2", "conv3", "conv4", "fc1"])):
        params = v[net]["params"]
        for name in convs:
            q = params[name]
            assert np.asarray(q["kernel_q"]).dtype == np.int8, (net, name)
            assert np.asarray(q["act_scale"]).shape == ()
            # per-output-channel weight scales
            assert (np.asarray(q["scale"]).shape
                    == (np.asarray(q["kernel_q"]).shape[-1],))
        # decision heads keep float kernels
        assert np.asarray(params["cls"]["kernel"]).dtype != np.int8
    assert np.asarray(
        v["pnet"]["params"]["conv1"]["kernel"]
    ).dtype != np.int8


def test_box_landmark_drift_bounded(det_float, det_int8):
    """Every float detection has an int8 partner at IoU>=0.8 with bounded
    landmark and score drift (and vice versa — no spurious extras)."""
    rng = np.random.default_rng(3)
    n_pairs = 0
    for cat in ("baseline", "crowded", "low_contrast"):
        img, _ = render_stress_scene(rng, cat, size=320)
        ff = det_float.detect(img)
        fq = det_int8.detect(img)
        assert abs(len(ff) - len(fq)) <= 1, cat
        if not ff or not fq:
            continue
        bf = np.asarray([f["bbox"] for f in ff], np.float32)
        bq = np.asarray([f["bbox"] for f in fq], np.float32)
        m = iou_matrix(bf, bq)
        # min over the larger side: every box on either side has a partner
        assert min(m.max(axis=1).min(), m.max(axis=0).min()) >= 0.8, cat
        part = m.argmax(axis=1)
        for i, f in enumerate(ff):
            q = fq[part[i]]
            lf = np.asarray(f["landmarks"], np.float32)
            lq = np.asarray(q["landmarks"], np.float32)
            box_d = max(f["bbox"][2] - f["bbox"][0], 1.0)
            # landmark drift bounded relative to face size
            assert np.abs(lf - lq).max() <= 0.08 * box_d + 1.0, cat
            assert abs(f["det_score"] - q["det_score"]) <= 0.1, cat
            n_pairs += 1
    assert n_pairs >= 5  # the comparison actually exercised faces


@pytest.mark.parametrize("category", ["baseline", "crowded"])
def test_stress_ap_parity(det_float, det_int8, category):
    rf = evaluate_detector_category(
        det_float, category, n_scenes=4, seed=7, operating_threshold=0.5)
    rq = evaluate_detector_category(
        det_int8, category, n_scenes=4, seed=7, operating_threshold=0.5)
    assert rq["ap"] >= rf["ap"] - 0.03, (rf["ap"], rq["ap"])
    assert (rq["operating_point"]["recall"]
            >= rf["operating_point"]["recall"] - 0.05)


def test_npz_roundtrip_bit_exact(det_int8, tmp_path):
    """save_npz of a quantized detector reloads without recalibration and
    reproduces detections bit-exactly (scales/kernels are data, not
    re-derived)."""
    path = str(tmp_path / "det_q.npz")
    det_int8.save_npz(path)
    det2 = MTCNNDetector(**{**KW, "weights_path": path}, quantize="int8")
    rng = np.random.default_rng(11)
    img, _ = render_stress_scene(rng, "baseline", size=320)
    a = det_int8.detect(img)
    b = det2.detect(img)
    assert len(a) == len(b)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa["bbox"], fb["bbox"])
        np.testing.assert_array_equal(fa["landmarks"], fb["landmarks"])
        assert fa["det_score"] == fb["det_score"]


def test_float_construction_rejects_quantized_vars(det_int8, tmp_path):
    path = str(tmp_path / "det_q.npz")
    det_int8.save_npz(path)
    with pytest.raises(ValueError, match="quantize='int8'"):
        MTCNNDetector(**{**KW, "weights_path": path})


def test_calibrate_on_quantized_raises(det_int8):
    with pytest.raises(RuntimeError, match="already quantized"):
        det_int8.calibrate_amax(np.zeros((1, 320, 320, 3), np.uint8))
