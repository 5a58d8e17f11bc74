"""Int8 post-training quantization of the IR backbones (models/quantize.py).

The reference has no quantization path (fp32 torch/ONNX backends,
`face_embedder.py:49-88`); this is a TPU-native serving lever, so the tests
pin its numerics: the quantized forward must track the fp32 folded forward
closely (cosine), the quantized tree must have the right structure/dtypes,
and the embedder/engine integration must behave identically modulo that
numeric tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from facerecognitionpipeline_tpu.models.irse import build_backbone
from facerecognitionpipeline_tpu.models.fold import fold_inference_variables
from facerecognitionpipeline_tpu.models.quantize import (
    calibrate_activation_amax,
    default_calibration_faces,
    quantize_folded_variables,
)
from facerecognitionpipeline_tpu.ops.image import preprocess_faces
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder


def _folded_setup(arch="ir_micro", seed=0):
    model = build_backbone(arch)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 112, 112, 3), jnp.float32)
    )
    folded = fold_inference_variables(variables)
    fmodel = build_backbone(arch, folded=True)
    return fmodel, folded


def _calib_batch(n=12, seed=1):
    return preprocess_faces(
        jnp.asarray(default_calibration_faces(n, seed=seed))
    )


def test_quantized_tree_structure_and_dtypes():
    fmodel, folded = _folded_setup()
    amax = calibrate_activation_amax(fmodel, folded, _calib_batch())
    qvars = quantize_folded_variables(folded, amax)
    params = qvars["params"]
    blocks = [k for k in params if k.startswith("stage")]
    assert blocks, "no residual blocks found"
    for blk in blocks:
        for conv in ("res_conv1", "res_conv2"):
            sub = params[blk][conv]
            assert set(sub) == {"kernel_q", "scale", "bias", "act_scale"}
            assert sub["kernel_q"].dtype == np.int8
            assert np.abs(sub["kernel_q"]).max() <= 127
            assert sub["scale"].dtype == np.float32
            assert float(sub["act_scale"]) > 0
            # per-output-channel symmetric: every channel uses its full range
            # (max|w_q| == 127 per channel, up to rounding)
            per_ch = np.abs(sub["kernel_q"]).max(axis=(0, 1, 2))
            assert (per_ch >= 126).all()
        # untouched pieces copy through in float
        if "shortcut_conv" in params[blk]:
            sc = params[blk]["shortcut_conv"]
            assert sc["kernel"].dtype == np.float32
            assert "bias" in sc
        assert "alpha" in params[blk]["res_prelu"]
    # float tail preserved
    assert "kernel" in params["output_fc"]
    assert params["output_fc"]["kernel"].dtype == np.float32


def test_quantized_forward_tracks_fp32():
    fmodel, folded = _folded_setup(seed=3)
    calib = _calib_batch(12, seed=2)
    amax = calibrate_activation_amax(fmodel, folded, calib)
    qvars = quantize_folded_variables(folded, amax)
    qmodel = build_backbone("ir_micro", folded=True, quantized=True)

    # evaluation inputs are DIFFERENT renders than calibration
    x = preprocess_faces(jnp.asarray(default_calibration_faces(8, seed=9)))
    f_ref, n_ref = fmodel.apply(folded, x)
    f_q, n_q = qmodel.apply(qvars, x)
    cos = np.sum(np.asarray(f_ref) * np.asarray(f_q), axis=1)
    assert cos.min() > 0.99, f"quantized forward drifted: cosine min {cos.min()}"
    # norms should agree to a few percent
    rel = np.abs(np.asarray(n_q) - np.asarray(n_ref)) / np.asarray(n_ref)
    assert rel.max() < 0.05


def test_quantized_requires_folded():
    with pytest.raises(ValueError, match="folded"):
        build_backbone("ir_micro", quantized=True).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3), jnp.float32)
        )


def test_embedder_quantize_flag():
    faces = default_calibration_faces(8, seed=5)
    e_ref = FaceEmbedder(architecture="ir_micro", model_path=None, init_seed=11)
    e_q = FaceEmbedder(
        architecture="ir_micro", model_path=None, init_seed=11, quantize="int8",
        calib_faces=default_calibration_faces(8, seed=6),
    )
    assert e_q.quantized and e_q.folded
    f_ref = e_ref.extract_embeddings_batch(faces)
    f_q = e_q.extract_embeddings_batch(faces)
    assert f_q.shape == f_ref.shape
    cos = np.sum(f_ref * f_q, axis=1)
    assert cos.min() > 0.99
    # embeddings stay unit-norm f32
    assert f_q.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(f_q, axis=1), 1.0, atol=1e-3)


def test_embedder_quantize_validation():
    with pytest.raises(ValueError, match="quantize"):
        FaceEmbedder(architecture="ir_micro", model_path=None, quantize="int4")
    with pytest.raises(ValueError, match="fold_bn"):
        FaceEmbedder(
            architecture="ir_micro", model_path=None, quantize="int8",
            fold_bn=False,
        )
    for bad in (np.zeros((0, 112, 112, 3), np.uint8),
                np.zeros((112, 112, 3), np.uint8),
                np.zeros((4, 112, 112), np.uint8)):
        with pytest.raises(ValueError, match="calib_faces"):
            FaceEmbedder(
                architecture="ir_micro", model_path=None, quantize="int8",
                calib_faces=bad,
            )


def test_engine_runs_with_quantized_embedder():
    """The fused step accepts a quantized embedder transparently."""
    from facerecognitionpipeline_tpu.gallery.search import DeviceGallery
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    det = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=20)
    emb = FaceEmbedder(
        architecture="ir_micro", model_path=None, quantize="int8",
        calib_faces=default_calibration_faces(8, seed=7),
    )
    eng = RecognitionEngine(det, emb, top_k=2)
    gal = DeviceGallery()
    rng = np.random.default_rng(0)
    t = rng.normal(size=(8, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    gal.rebuild([f"id{i}" for i in range(8)], t)
    frames = rng.integers(0, 256, size=(2, 160, 160, 3), dtype=np.uint8)
    out = eng.process_frames(frames, gal._templates, gal._valid, gallery_k=2)
    assert out["embeddings"].shape == (2, 4, 512)
    assert np.isfinite(np.asarray(out["match_scores"])).all()


def test_calibration_headroom_scales_act_scale():
    fmodel, folded = _folded_setup()
    amax = calibrate_activation_amax(fmodel, folded, _calib_batch())
    q1 = quantize_folded_variables(folded, amax, headroom=1.0)
    q2 = quantize_folded_variables(folded, amax, headroom=2.0)
    blk = next(k for k in q1["params"] if k.startswith("stage"))
    a1 = float(q1["params"][blk]["res_conv1"]["act_scale"])
    a2 = float(q2["params"][blk]["res_conv1"]["act_scale"])
    assert a2 == pytest.approx(2.0 * a1)


def test_missing_calibration_block_raises():
    fmodel, folded = _folded_setup()
    amax = calibrate_activation_amax(fmodel, folded, _calib_batch())
    bad = {k: v for k, v in amax.items() if not k.endswith("unit0")}
    with pytest.raises(ValueError, match="amax"):
        quantize_folded_variables(folded, bad)


def test_quantized_forward_tracks_fp32_at_bf16():
    """The serving config (dtype=bfloat16, quantize='int8') must hold the
    same numeric tolerance as f32 — server.py builds exactly this."""
    faces = default_calibration_faces(8, seed=21)
    e_ref = FaceEmbedder(architecture="ir_micro", model_path=None, init_seed=13)
    e_q16 = FaceEmbedder(
        architecture="ir_micro", model_path=None, init_seed=13,
        dtype=jnp.bfloat16, quantize="int8",
        calib_faces=default_calibration_faces(8, seed=22),
    )
    f_ref = e_ref.extract_embeddings_batch(faces)
    f_q = e_q16.extract_embeddings_batch(faces)
    cos = np.sum(f_ref * f_q, axis=1)
    assert cos.min() > 0.985, f"bf16+int8 drifted: cosine min {cos.min()}"


def test_load_calibration_faces_dir(tmp_path):
    from facerecognitionpipeline_tpu.models.quantize import load_calibration_faces
    from facerecognitionpipeline_tpu.utils.io import imwrite_rgb

    crops = default_calibration_faces(3, seed=1)
    for i, c in enumerate(crops):
        imwrite_rgb(str(tmp_path / f"face_{i}.png"), c)
    # odd-size crop exercises the resize path
    imwrite_rgb(str(tmp_path / "big.png"), np.zeros((160, 160, 3), np.uint8))
    (tmp_path / "notes.txt").write_text("ignored")
    loaded = load_calibration_faces(str(tmp_path), limit=3)
    assert loaded.shape == (3, 112, 112, 3) and loaded.dtype == np.uint8
    with pytest.raises(ValueError, match="no readable"):
        load_calibration_faces(str(tmp_path / "empty_missing"))


@pytest.mark.parametrize(
    "use_se,conv_shortcut",
    [(True, False), (False, True)],  # IR-SE blocks; iresnet conv shortcuts
)
def test_quantized_variants_track_fp32(use_se, conv_shortcut):
    """SE modules and iresnet conv shortcuts copy through unquantized and
    the quantized forward still tracks fp32 (the plain-IR case is covered
    by test_quantized_forward_tracks_fp32)."""
    from facerecognitionpipeline_tpu.models.irse import IRBackbone

    kw = dict(units=(1, 1, 1, 1), use_se=use_se, conv_shortcut=conv_shortcut)
    model = IRBackbone(**kw)
    variables = model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 112, 112, 3), jnp.float32)
    )
    folded = fold_inference_variables(variables)
    fmodel = IRBackbone(**kw, folded=True)
    amax = calibrate_activation_amax(fmodel, folded, _calib_batch(8, seed=31))
    qvars = quantize_folded_variables(folded, amax)
    if use_se:
        blk = next(k for k in qvars["params"] if k.startswith("stage"))
        assert "se" in qvars["params"][blk]  # copied through, float
    qmodel = IRBackbone(**kw, folded=True, quantized=True)
    x = preprocess_faces(jnp.asarray(default_calibration_faces(6, seed=32)))
    f_ref, _ = fmodel.apply(folded, x)
    f_q, _ = qmodel.apply(qvars, x)
    cos = np.sum(np.asarray(f_ref) * np.asarray(f_q), axis=1)
    assert cos.min() > 0.99, f"variant drifted: cosine min {cos.min()}"


def test_engine_budget_composes_with_quantized_embedder():
    """--embed_budget K --quantize int8 (the production serving combo):
    the compacted gather/scatter path must respect the embedded mask with a
    quantized backbone exactly as with the bf16 one."""
    from facerecognitionpipeline_tpu.gallery.search import DeviceGallery
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
    from facerecognitionpipeline_tpu.pipeline.engine import RecognitionEngine

    det = MTCNNDetector(det_size=(160, 160), max_faces=4, min_face_size=20)
    emb = FaceEmbedder(
        architecture="ir_micro", model_path=None, quantize="int8",
        calib_faces=default_calibration_faces(8, seed=41),
    )
    eng = RecognitionEngine(det, emb, top_k=2, embed_budget=2)
    gal = DeviceGallery()
    rng = np.random.default_rng(1)
    t = rng.normal(size=(8, 512)).astype(np.float32)
    t /= np.linalg.norm(t, axis=1, keepdims=True)
    gal.rebuild([f"id{i}" for i in range(8)], t)
    frames = rng.integers(0, 256, size=(2, 160, 160, 3), dtype=np.uint8)
    out = eng.process_frames(frames, gal._templates, gal._valid, gallery_k=2)
    embedded = np.asarray(out["embedded"])
    assert embedded.sum(axis=1).max() <= 2  # budget respected
    # non-embedded slots carry sentinel scores; embedded ones are finite
    scores = np.asarray(out["match_scores"])
    assert (scores[~embedded] == -1.0).all()
    assert np.isfinite(scores[embedded]).all()

# ---------------------------------------------------------- fused int8 body


def test_fused_quantized_tree_structure():
    from facerecognitionpipeline_tpu.models.quantize import fuse_quantized_params

    fmodel, folded = _folded_setup(seed=4)
    amax = calibrate_activation_amax(fmodel, folded, _calib_batch())
    fused = fuse_quantized_params(quantize_folded_variables(folded, amax))
    params = fused["params"]
    blocks = [k for k in params if k.startswith("stage")]
    assert blocks
    for blk in blocks:
        body = params[blk]["body"]
        assert set(body) == {
            "qscale", "qshift", "kernel1_q", "mid_scale", "mid_bias",
            "alpha", "kernel2_q", "out_scale", "out_bias",
        }
        assert body["kernel1_q"].dtype == np.int8
        assert body["kernel2_q"].dtype == np.int8
        for k in ("qscale", "qshift", "mid_scale", "mid_bias", "alpha",
                  "out_scale", "out_bias"):
            assert body[k].dtype == np.float32
        # the unfused per-op params are gone (no double-carry)
        assert "res_conv1" not in params[blk]
        assert "res_affine" not in params[blk]


def test_fused_quantized_matches_unfused():
    """The fused int8 chain is the same algebra as the op-per-op path —
    outputs must agree to fp-rounding (round() ties can flip one LSB)."""
    from facerecognitionpipeline_tpu.models.quantize import fuse_quantized_params

    fmodel, folded = _folded_setup(seed=4)
    calib = _calib_batch(12, seed=2)
    amax = calibrate_activation_amax(fmodel, folded, calib)
    qvars = quantize_folded_variables(folded, amax)
    fvars = fuse_quantized_params(qvars)
    qmodel = build_backbone("ir_micro", folded=True, quantized=True)
    fqmodel = build_backbone(
        "ir_micro", folded=True, quantized=True, fused_int8=True
    )
    x = preprocess_faces(jnp.asarray(default_calibration_faces(8, seed=9)))
    f_q, n_q = qmodel.apply(qvars, x)
    f_f, n_f = fqmodel.apply(fvars, x)
    cos = np.sum(np.asarray(f_q) * np.asarray(f_f), axis=1)
    assert cos.min() > 0.9999, f"fused int8 drifted from unfused: {cos.min()}"
    # and both still track the fp32 folded forward
    f_ref, _ = fmodel.apply(folded, x)
    cos_ref = np.sum(np.asarray(f_ref) * np.asarray(f_f), axis=1)
    assert cos_ref.min() > 0.99


def test_embedder_int8_fused_flag_parity():
    calib = default_calibration_faces(8, seed=6)
    faces = default_calibration_faces(8, seed=5)
    e_fused = FaceEmbedder(
        architecture="ir_micro", model_path=None, init_seed=11,
        quantize="int8", calib_faces=calib, int8_fused=True,
    )
    e_unfused = FaceEmbedder(
        architecture="ir_micro", model_path=None, init_seed=11,
        quantize="int8", calib_faces=calib, int8_fused=False,
    )
    assert e_fused.model.fused_int8 and not e_unfused.model.fused_int8
    # parity between the two int8 implementations
    f_a = e_fused.extract_embeddings_batch(faces)
    f_b = e_unfused.extract_embeddings_batch(faces)
    cos = np.sum(f_a * f_b, axis=1)
    assert cos.min() > 0.9999
