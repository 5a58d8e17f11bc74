"""Detector out-of-distribution evaluation (and domain-randomized retrain).

VERDICT r4 #2: measures the shipped cascade on scenes from a renderer it
has NEVER seen (train/facegen.py — no shared drawing code with any training
renderer) plus a corruption battery outside the training augmentation set
(JPEG, defocus, low-light shot noise, sensor banding). Writes
reports/detector_ood/report.json.

With --retrain: domain-randomize training (mix facegen scenes + corruption
into the stress training mix), ship pretrained/mtcnn_dr.npz, and re-run
BOTH the OOD suite and the in-distribution stress suite — the point is to
close the OOD gap and lift the weak occlusion axis without regressing the
rest. Note the "base" rows remain the honest held-out measurement; after a
retrain the facegen renderer is no longer held out from mtcnn_dr.npz
(that's the price of closing a measured gap — the report says which is
which).

Run:  python examples/detector_ood_eval.py [--retrain] [--weights PATH]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DR_WEIGHTS = os.path.join(REPO, "pretrained", "mtcnn_dr.npz")


def make_detector(weights_path: str):
    from facerecognitionpipeline_tpu.models.detector import MTCNNDetector

    return MTCNNDetector(
        det_size=(320, 320), max_faces=32, min_face_size=18,
        weights_path=weights_path, stage_thresholds=(0.6, 0.6, 0.5),
    )


def facegen_training_scene(rng: np.random.Generator):
    """Training-shaped facegen scene: (image, boxes, landmarks) at the
    patch sampler's scale, with the OOD corruption battery applied half the
    time (domain randomization)."""
    from facerecognitionpipeline_tpu.evalharness.detection_ood import (
        _CORRUPTIONS,
        _identities,
    )
    from facerecognitionpipeline_tpu.train.facegen import compose_scene

    idents = _identities(rng, int(rng.integers(1, 4)))
    img, boxes, lms, _ = compose_scene(idents, rng, size=160,
                                       min_face=24, max_face=64)
    if rng.random() < 0.5:
        name = list(_CORRUPTIONS)[int(rng.integers(0, len(_CORRUPTIONS)))]
        img = _CORRUPTIONS[name](img, rng)
    # 3-tuple on purpose: compose_scene's 4th element is identity indices,
    # which sample_patches would misread as hard-negative boxes
    return img, boxes, lms


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None)
    p.add_argument("--retrain", action="store_true")
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--class_balance", default="0.24,0.23", metavar="POS,PART",
                   help="per-batch patch-label quota (pos,part fractions) — "
                        "keeps positive supervision constant while the "
                        "domain-randomized mix adds negative diversity "
                        "(same rationale as detector_stress_eval)")
    p.add_argument("--n_scenes", type=int, default=12)
    p.add_argument("--output_dir",
                   default=os.path.join(REPO, "reports", "detector_ood"))
    args = p.parse_args()

    from facerecognitionpipeline_tpu.evalharness.detection import (
        render_stress_training_scene,
        run_stress_suite,
    )
    from facerecognitionpipeline_tpu.evalharness.detection_ood import (
        run_ood_suite,
    )
    from facerecognitionpipeline_tpu.models.detector import (
        discover_default_weights,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    report = {}

    base_weights = args.weights or discover_default_weights()
    print(f"OOD-evaluating {base_weights}...", file=sys.stderr)
    report["base"] = {
        "weights": os.path.relpath(base_weights, REPO),
        "held_out": True,
        **run_ood_suite(make_detector(base_weights),
                        n_scenes=args.n_scenes, seed=0),
    }
    print(json.dumps(report["base"]["summary"], indent=1))

    if args.retrain:
        from facerecognitionpipeline_tpu.train.detector_train import (
            render_scene,
            train_detector,
        )

        def mixed_scene(rng):
            r = rng.random()
            if r < 0.3:
                return render_scene(rng)
            if r < 0.7:
                # stress mix carries the occluders/distractors/pure-negative
                # scenes that keep hard-negative FP and occlusion recall
                return render_stress_training_scene(rng, pure_negative_p=0.3)
            return facegen_training_scene(rng)

        print("Retraining cascade with domain randomization...",
              file=sys.stderr)
        balance = (
            tuple(float(x) for x in args.class_balance.split(","))
            if args.class_balance else None
        )
        variables = train_detector(
            steps=args.steps, scene_fn=mixed_scene, ohem_fraction=0.7,
            class_balance=balance,
        )
        det = make_detector(base_weights)
        det.variables = variables
        det.save_npz(DR_WEIGHTS)
        print(f"Saved {DR_WEIGHTS}", file=sys.stderr)
        report["dr_retrained_ood"] = {
            "weights": os.path.relpath(DR_WEIGHTS, REPO),
            "held_out": False,
            **run_ood_suite(det, n_scenes=args.n_scenes, seed=0),
        }
        print(json.dumps(report["dr_retrained_ood"]["summary"], indent=1))
        print("In-distribution stress suite on the retrained weights "
              "(regression check)...", file=sys.stderr)
        report["dr_retrained_stress"] = {
            "weights": os.path.relpath(DR_WEIGHTS, REPO),
            **run_stress_suite(det, n_scenes=args.n_scenes, seed=0),
        }
        print(json.dumps(report["dr_retrained_stress"]["summary"], indent=1))

    with open(os.path.join(args.output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {args.output_dir}/report.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
