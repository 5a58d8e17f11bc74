"""Rich procedural face generator (train/facegen.py): determinism, identity
distinctness, scene ground truth, corpus/batch plumbing."""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.train.facegen import (
    build_corpus,
    compose_scene,
    corpus_batches,
    render_crop,
    render_face,
    sample_identity,
    to_model_input,
)


def test_identity_deterministic_and_distinct():
    a1 = sample_identity(7)
    a2 = sample_identity(7)
    b = sample_identity(8)
    assert a1 == a2
    assert a1 != b


def test_render_face_landmark_geometry():
    ident = sample_identity(3)
    img, bbox, lms = render_face(ident, size=112)
    assert img.shape == (112, 112, 3) and img.dtype == np.uint8
    assert lms.shape == (5, 2)
    le, re, nose, ml, mr = lms
    # canonical geometry: eyes above nose above mouth; left left of right
    assert le[0] < re[0]
    assert ml[0] < mr[0]
    assert le[1] < nose[1] < (ml[1] + mr[1]) / 2 + 1
    # landmarks inside the bbox
    for x, y in lms:
        assert bbox[0] - 2 <= x <= bbox[2] + 2
        assert bbox[1] - 2 <= y <= bbox[3] + 2


def test_yaw_moves_nose_laterally():
    ident = sample_identity(5)
    _, _, lm_l = render_face(ident, size=112, yaw=-0.4)
    _, _, lm_c = render_face(ident, size=112, yaw=0.0)
    _, _, lm_r = render_face(ident, size=112, yaw=0.4)
    # nose tip (index 2) has the most depth -> largest parallax
    assert lm_l[2][0] < lm_c[2][0] < lm_r[2][0]


def test_same_identity_renders_more_similar_than_different():
    """Pixel-space sanity: same-identity crops (pose/light jitter) correlate
    more with each other than with a different identity's crops."""
    rng = np.random.default_rng(0)
    a = sample_identity(10)
    b = sample_identity(11)

    def mean_crop(ident, seed):
        r = np.random.default_rng(seed)
        return np.mean(
            [render_crop(ident, r, pose_scale=0.3, light_scale=0.3).astype(
                np.float32
            ) for _ in range(4)],
            axis=0,
        )

    ma1, ma2, mb = mean_crop(a, 1), mean_crop(a, 2), mean_crop(b, 3)

    def d(x, y):
        return float(np.mean(np.abs(x - y)))

    assert d(ma1, ma2) < d(ma1, mb)


def test_compose_scene_ground_truth():
    rng = np.random.default_rng(4)
    idents = [sample_identity(i) for i in range(3)]
    img, boxes, lms, used = compose_scene(idents, rng, size=160)
    assert img.shape == (160, 160, 3)
    assert boxes.shape == (len(used), 4)
    assert lms.shape == (len(used), 5, 2)
    assert len(used) >= 1
    for b in boxes:
        assert b[2] > b[0] and b[3] > b[1]


def test_build_corpus_shapes_and_disjoint_offsets():
    imgs, labels = build_corpus(4, 3, seed=0)
    assert imgs.shape == (12, 112, 112, 3) and imgs.dtype == np.uint8
    assert labels.tolist() == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # id_offset shifts the identity space: offset corpora differ
    imgs2, _ = build_corpus(4, 3, seed=0, id_offset=1000)
    assert not np.array_equal(imgs, imgs2)
    # same seed+offset reproduces exactly
    imgs3, _ = build_corpus(4, 3, seed=0)
    np.testing.assert_array_equal(imgs, imgs3)


def test_corpus_batches_uint8_and_device_convert():
    imgs, labels = build_corpus(3, 4, seed=1)
    it = corpus_batches(imgs, labels, batch_size=8, seed=0)
    b, y = next(it)
    assert b.shape == (8, 112, 112, 3) and b.dtype == np.uint8
    assert y.shape == (8,) and y.dtype == np.int32
    x = np.asarray(to_model_input(b))
    assert x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0
    # BGR flip: channel 0 of the model input is channel 2 of the render
    np.testing.assert_allclose(
        x[..., 0], (b[..., 2].astype(np.float32) - 127.5) / 127.5, atol=1e-6
    )


def test_ood_scene_categories_render():
    from facerecognitionpipeline_tpu.evalharness.detection_ood import (
        OOD_CATEGORIES,
        render_ood_scene,
    )

    rng = np.random.default_rng(2)
    for cat in OOD_CATEGORIES:
        img, boxes = render_ood_scene(rng, cat, size=160)
        assert img.shape == (160, 160, 3) and img.dtype == np.uint8
        assert boxes.ndim == 2 and boxes.shape[1] == 4


def test_ood_unknown_category_raises():
    from facerecognitionpipeline_tpu.evalharness.detection_ood import (
        render_ood_scene,
    )

    with pytest.raises(ValueError):
        render_ood_scene(np.random.default_rng(0), "nope", size=96)
