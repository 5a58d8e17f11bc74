"""Masked NMS vs a plain numpy greedy reference."""

import numpy as np

from facerecognitionpipeline_tpu.ops.nms import nms_mask, pairwise_iou, topk_boxes


def _numpy_nms(boxes, scores, thresh, mode="union"):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            denom = min(ai, aj) if mode == "min" else ai + aj - inter
            if inter / max(denom, 1e-9) > thresh and scores[j] <= scores[i]:
                suppressed[j] = True
    return sorted(keep)


def _random_boxes(rng, n):
    xy = rng.uniform(0, 200, size=(n, 2))
    wh = rng.uniform(10, 80, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_numpy_reference(rng):
    for mode in ("union", "min"):
        for trial in range(5):
            boxes = _random_boxes(rng, 64)
            scores = rng.uniform(0.1, 1.0, size=64).astype(np.float32)
            # make scores unique so greedy order is deterministic
            scores += np.arange(64, dtype=np.float32) * 1e-5
            valid = np.ones(64, bool)
            keep = np.asarray(nms_mask(boxes, scores, valid, 0.4, mode=mode))
            golden = _numpy_nms(boxes, scores, 0.4, mode=mode)
            assert sorted(np.nonzero(keep)[0].tolist()) == golden


def test_nms_respects_valid_mask(rng):
    boxes = _random_boxes(rng, 16)
    scores = rng.uniform(0.1, 1.0, size=16).astype(np.float32)
    valid = np.zeros(16, bool)
    valid[:4] = True
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    assert not keep[4:].any()


def test_pairwise_iou_identity(rng):
    boxes = _random_boxes(rng, 8)
    iou = np.asarray(pairwise_iou(boxes))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-5)
    assert (iou <= 1.0 + 1e-6).all() and (iou >= 0).all()


def test_topk_boxes(rng):
    boxes = _random_boxes(rng, 10)
    scores = np.arange(10, dtype=np.float32)
    valid = np.ones(10, bool)
    valid[9] = False
    b, s, v = topk_boxes(boxes, scores, valid, 3)
    assert list(np.asarray(s)) == [8.0, 7.0, 6.0]
    assert np.asarray(v).all()


def test_nms_deep_suppression_chain():
    """A chain of neighbor-overlapping boxes with descending scores has
    suppression-chain depth ~N (keep 0 -> suppresses 1 -> frees 2 -> ...):
    exercises the while_loop continuation past the unrolled 7-sweep
    prologue (ops/nms.py) and must still match greedy exactly."""
    n = 41
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 12.0, 0.0, i * 12.0 + 20.0, 20.0]  # IoU(nbr)~0.25
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    valid = np.ones(n, bool)
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.2))
    golden = _numpy_nms(boxes, scores, 0.2)
    assert golden == list(range(0, n, 2))  # sanity: alternating survivors
    assert sorted(np.nonzero(keep)[0].tolist()) == golden
