"""Packed-pyramid P-net: layout invariants + bit-exactness vs per-scale.

The packed stage-1 (models/detector._stage1_packed) runs P-net once over a
shelf-packed canvas; correctness rests on every region submap being
BIT-EXACT equal to running P-net on that scale alone. These tests pin the
packing invariants, the submap exactness claim, and end-to-end detection
parity between the packed and per-scale cascades.
"""

import numpy as np
import pytest

from facerecognitionpipeline_tpu.models.detector import (
    MTCNNDetector,
    _pack_pyramid,
    _pnet_out_dim,
)


def test_pack_layout_invariants():
    for h, w, minf in [(640, 640, 40), (320, 320, 18), (480, 640, 20)]:
        det = MTCNNDetector(
            det_size=(h, w), min_face_size=minf, weights_path="random"
        )
        ch, cw, regions = _pack_pyramid(h, w, det.scales)
        assert len(regions) == len(det.scales)
        assert ch % 2 == 0 and cw % 2 == 0
        occupied = np.zeros((ch, cw), bool)
        for sh, sw, oy, ox in regions:
            assert sh % 2 == 0 and sw % 2 == 0, "even dims required"
            assert oy % 2 == 0 and ox % 2 == 0, "even origins required"
            assert oy + sh <= ch and ox + sw <= cw, "region inside canvas"
            assert not occupied[oy:oy + sh, ox:ox + sw].any(), "overlap"
            occupied[oy:oy + sh, ox:ox + sw] = True
            # scaled dims round UP from the nominal scale (never lose pixels)
        # largest region corresponds to the first (largest) scale
        assert regions[0][0] >= regions[-1][0]


def test_pnet_out_dim_matches_network():
    import jax.numpy as jnp

    from facerecognitionpipeline_tpu.models.detector_nets import PNet

    net = PNet()
    for s in (14, 48, 192):
        v = net.init(__import__("jax").random.PRNGKey(0), jnp.zeros((1, s, s, 3)))
        prob, _ = net.apply(v, jnp.zeros((1, s, s, 3)))
        assert prob.shape[1] == _pnet_out_dim(s), s


def test_packed_submaps_bit_exact():
    """P-net over the canvas == P-net per scale, bit for bit, per region."""
    import jax
    import jax.numpy as jnp

    det = MTCNNDetector(det_size=(320, 320), min_face_size=18,
                        weights_path="random", pack_pyramid=True)
    ch, cw, regions = det._canvas_hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(320, 320, 3)).astype(np.float32))

    canvas = jnp.zeros((ch, cw, 3), jnp.float32)
    scaled_all = []
    for sh, sw, oy, ox in regions:
        scaled = jax.image.resize(img, (sh, sw, 3), method="linear")
        scaled_all.append(scaled)
        canvas = jax.lax.dynamic_update_slice(canvas, scaled, (oy, ox, 0))
    prob, reg = det.pnet.apply(det.variables["pnet"], canvas[None])
    prob, reg = np.asarray(prob[0]), np.asarray(reg[0])

    for (sh, sw, oy, ox), scaled in zip(regions, scaled_all):
        p1, r1 = det.pnet.apply(det.variables["pnet"], scaled[None])
        fh, fw = _pnet_out_dim(sh), _pnet_out_dim(sw)
        a, b = oy // 2, ox // 2
        np.testing.assert_array_equal(np.asarray(p1[0]), prob[a:a + fh, b:b + fw])
        np.testing.assert_array_equal(np.asarray(r1[0]), reg[a:a + fh, b:b + fw])


@pytest.mark.parametrize("seed", [3, 11])
def test_packed_cascade_detection_parity(seed):
    """Packed vs per-scale cascade agree on rendered scenes (the proposal
    coordinates differ sub-pixel — even-rounded sizes + per-axis mapping —
    so parity is at the detection level: same faces, tight IoU)."""
    from facerecognitionpipeline_tpu.evalharness.detection import (
        iou_matrix,
        render_stress_scene,
    )

    kw = dict(det_size=(320, 320), max_faces=32, min_face_size=18,
              stage_thresholds=(0.6, 0.6, 0.5))
    packed = MTCNNDetector(pack_pyramid=True, **kw)
    unpacked = MTCNNDetector(pack_pyramid=False, **kw)
    assert packed.pretrained, "shipped weights expected"

    rng = np.random.default_rng(seed)
    img, gt = render_stress_scene(rng, "baseline", size=320)
    fp = packed.detect(img)
    fu = unpacked.detect(img)
    assert len(fp) == len(fu) == len(gt)
    bp = np.array([f["bbox"] for f in fp], np.float32)
    bu = np.array([f["bbox"] for f in fu], np.float32)
    # order by score may tie-break differently; match greedily by IoU
    m = iou_matrix(bp, bu)
    assert (m.max(axis=1) > 0.8).all(), m.max(axis=1)
