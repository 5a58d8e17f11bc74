"""All-synthetic end-to-end demo: the framework trains, enrolls, recognizes.

Zero external assets: procedural identities are rendered, the detector
cascade is (re)trained on them (or the shipped `pretrained/mtcnn_synthetic.npz`
is reused), the IR embedder is trained with the AdaFace margin loss on the
same identities, fresh crops are enrolled into the gallery, and new rendered
scenes are recognized through the full fused pipeline.

Run: PYTHONPATH=. python examples/synthetic_end_to_end.py
(Measured on TPU v5e-1: ~7 minutes total; prints rank-1 accuracy at the end.)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager
from facerecognitionpipeline_tpu.models.detector import MTCNNDetector
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.pipeline.matcher import FaceMatcher
from facerecognitionpipeline_tpu.pipeline.processor import FaceProcessor
from facerecognitionpipeline_tpu.train.checkpoint import export_backbone
from facerecognitionpipeline_tpu.train.detector_train import (
    make_identity,
    render_identity_crop,
    render_identity_scene,
    train_detector,
)
from facerecognitionpipeline_tpu.train.trainer import TrainConfig, Trainer

N_IDENTITIES = 16
EMBEDDER_STEPS = 400
DETECTOR_WEIGHTS = "pretrained/mtcnn_synthetic.npz"
EMBEDDER_WEIGHTS = "pretrained/ir_micro_synthetic.npz"


def get_detector() -> MTCNNDetector:
    if os.path.exists(DETECTOR_WEIGHTS):
        print(f"Using shipped detector weights: {DETECTOR_WEIGHTS}")
        return MTCNNDetector(
            det_size=(160, 160), max_faces=8, min_face_size=20,
            weights_path=DETECTOR_WEIGHTS, stage_thresholds=(0.6, 0.6, 0.5),
        )
    print("Training the detector cascade on rendered faces (~5 min)...")
    variables = train_detector(steps=500, batch=256)
    det = MTCNNDetector(
        det_size=(160, 160), max_faces=8, min_face_size=20,
        variables=variables, stage_thresholds=(0.6, 0.6, 0.5),
    )
    det.save_npz(DETECTOR_WEIGHTS)
    return det


def build_aligned_pool(identities, processor, per_identity: int = 20):
    """Detected-and-aligned crops per identity: the embedder trains on the
    same distribution the recognition path produces (background, detector
    alignment jitter), not just centered renders."""
    rng = np.random.default_rng(7)
    pool = {i: [] for i in range(len(identities))}
    for i, ident in enumerate(identities):
        attempts = 0
        while len(pool[i]) < per_identity and attempts < per_identity * 3:
            attempts += 1
            scene, boxes, _, _ = render_identity_scene([ident], rng, size=160)
            if not len(boxes):
                continue
            faces = processor.process_numpy(scene, return_all=True)
            if faces:
                pool[i].append(faces[0]["aligned_face"])
    counts = {i: len(v) for i, v in pool.items()}
    print(f"  aligned pool sizes: min {min(counts.values())} "
          f"max {max(counts.values())}")
    return pool


def get_embedder(identities, processor=None) -> FaceEmbedder:
    if os.path.exists(EMBEDDER_WEIGHTS):
        print(f"Using cached embedder weights: {EMBEDDER_WEIGHTS}")
        return FaceEmbedder(architecture="ir_micro", model_path=EMBEDDER_WEIGHTS)
    print(f"Training the embedder on {len(identities)} synthetic identities "
          f"({EMBEDDER_STEPS} steps, ~6 min)...")
    pool = build_aligned_pool(identities, processor) if processor else None
    rng = np.random.default_rng(0)
    from facerecognitionpipeline_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    cfg = TrainConfig(
        architecture="ir_micro", num_classes=len(identities), loss="adaface",
        learning_rate=0.05, dtype=jnp.bfloat16,
    )
    trainer = Trainer(cfg, mesh)
    state = trainer.init_state(0)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for step in range(EMBEDDER_STEPS):
        labels = rng.integers(0, len(identities), size=64).astype(np.int32)
        imgs = []
        for l in labels:
            # half centered renders, half detector-aligned crops (domain match)
            if pool and pool[int(l)] and rng.random() < 0.5:
                imgs.append(pool[int(l)][rng.integers(0, len(pool[int(l)]))])
            else:
                imgs.append(render_identity_crop(identities[l], rng))
        imgs = np.stack(imgs)
        x = (imgs[:, :, :, ::-1].astype(np.float32) - 127.5) / 127.5
        state, metrics = trainer.train_step(state, x, labels, key)
        if (step + 1) % 100 == 0:
            print(f"  step {step+1}: loss {float(metrics['loss']):.4f} "
                  f"({time.time()-t0:.0f}s)")
    export_backbone(state, EMBEDDER_WEIGHTS)
    return FaceEmbedder(architecture="ir_micro", model_path=EMBEDDER_WEIGHTS)


def main() -> int:
    identities = [make_identity(i) for i in range(N_IDENTITIES)]
    rng = np.random.default_rng(42)

    detector = get_detector()
    processor = FaceProcessor(
        output_size=112, detector=detector,
        quality_filter_config={"min_det_score": 0.5, "min_face_size": 15,
                               "max_yaw": 90, "max_pitch": 90, "max_roll": 90,
                               "check_blur": False},
    )
    embedder = get_embedder(identities, processor)

    print("\nEnrolling identities from detector-aligned crops...")
    enroll_pool = build_aligned_pool(identities, processor, per_identity=4)
    gallery = GalleryManager(gallery_path="/tmp/synth_demo/students.pkl",
                             verbose=False)
    for i, ident in enumerate(identities):
        crops = enroll_pool[i] or [render_identity_crop(ident, rng)]
        gallery.add_student(f"SYN{i:03d}", f"Identity {i}",
                            embedder.extract_embeddings_batch(crops))

    print("Recognizing rendered scenes through the FULL pipeline "
          "(real detection + alignment + embedding + matching)...")

    def run_recognition(emb, seed=1234):
        m = FaceMatcher(embedder=emb, gallery=gallery,
                        similarity_threshold=0.5, processor=processor)
        trial_rng = np.random.default_rng(seed)
        correct = total = 0
        for trial in range(20):
            idx = trial_rng.choice(N_IDENTITIES, size=1)
            scene, boxes, lms, used = render_identity_scene(
                [identities[i] for i in idx], trial_rng, size=160
            )
            if not len(boxes):
                continue
            faces = processor.process_numpy(scene, return_all=True)
            if not faces:
                total += 1
                continue
            results = m.match_faces_batch(
                [f["aligned_face"] for f in faces[:1]], top_k=1
            )
            total += 1
            if results and results[0] and results[0][0][0] == f"SYN{idx[0]:03d}":
                correct += 1
        return correct, total

    correct, total = run_recognition(embedder)
    print(f"\nScene recognition rank-1: {correct}/{total} "
          f"({100*correct/max(total,1):.0f}%)")

    # Int8-quantized pass: the SAME trained weights, post-training-quantized
    # (models/quantize.py), matched against the SAME fp32-enrolled gallery —
    # the realistic deployment (enroll once in fp32, serve quantized).
    # Calibration uses detector-aligned crops, i.e. real serving inputs.
    print("\nRe-running recognition with the int8-quantized embedder...")
    calib = np.stack(
        [c for crops in enroll_pool.values() for c in crops]
        or [render_identity_crop(identities[0], rng)]
    )
    embedder_q = FaceEmbedder(
        architecture="ir_micro", model_path=EMBEDDER_WEIGHTS,
        quantize="int8", calib_faces=calib,
    )
    probes = np.stack([render_identity_crop(identities[i % N_IDENTITIES],
                                            np.random.default_rng(500 + i))
                       for i in range(32)])
    f32 = embedder.extract_embeddings_batch(probes)
    fq = embedder_q.extract_embeddings_batch(probes)
    cos = np.sum(f32 * fq, axis=1)
    correct_q, total_q = run_recognition(embedder_q)
    print(f"int8 embedding drift vs fp32: cosine min {cos.min():.5f} "
          f"mean {cos.mean():.5f}")
    print(f"Scene recognition rank-1 (int8): {correct_q}/{total_q} "
          f"({100*correct_q/max(total_q,1):.0f}%)")
    ok = correct / max(total, 1) >= 0.6 and correct_q / max(total_q, 1) >= 0.6
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
