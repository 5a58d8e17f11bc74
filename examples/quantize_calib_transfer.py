"""Quantify int8 calibration-transfer risk under input distribution shift.

`models/quantize.py` calibrates static activation scales on synthetic
renders by default and its own docstring warns the scales "transfer only
approximately" to shifted inputs. This experiment measures how wrong that
gets (VERDICT r3 #5): probes are perturbed with brightness / contrast /
Gaussian-noise sweeps, and for each shift level we report

* cosine(int8 embedding, fp32 embedding) of the SAME shifted probe — the
  pure quantization error under that input distribution (scales calibrated
  on CLEAN renders, the shipped default);
* the same cosine with ORACLE scales recalibrated on the shifted
  distribution itself — the delta isolates the calibration-transfer term
  from the irreducible int8 rounding term;
* rank-1 identification of fp32 vs int8 probes against a clean
  fp32-enrolled gallery — does the drift ever change a decision.

Weights: the synthetic-trained ir_micro checkpoint
(`pretrained/ir_micro_synthetic.npz`, produced by
examples/synthetic_end_to_end.py) so rank-1 is meaningful; pass --arch /
--weights for others. Results land in reports/quantize_transfer/.

Run:  python examples/quantize_calib_transfer.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IDENTITIES = 16
PROBES_PER_ID = 6
ENROLL_PER_ID = 4


def render_corpus(seed0: int, per_id: int, size: int = 112) -> np.ndarray:
    from facerecognitionpipeline_tpu.train.detector_train import (
        make_identity,
        render_identity_crop,
    )

    out = []
    for i in range(N_IDENTITIES):
        ident = make_identity(1000 + i)
        rng = np.random.default_rng(seed0 + i)
        out.append(
            np.stack([
                render_identity_crop(ident, rng, size=size)
                for _ in range(per_id)
            ])
        )
    return np.stack(out)  # [ID, per_id, S, S, 3] uint8


def apply_shift(images: np.ndarray, kind: str, level: float,
                seed: int = 0) -> np.ndarray:
    x = images.astype(np.float32)
    if kind == "brightness":
        x = x + level
    elif kind == "contrast":
        x = (x - 128.0) * level + 128.0
    elif kind == "noise":
        rng = np.random.default_rng(seed)
        x = x + rng.normal(scale=level, size=x.shape)
    else:
        raise ValueError(kind)
    return np.clip(np.round(x), 0, 255).astype(np.uint8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", type=str, default="ir_micro")
    ap.add_argument("--weights", type=str,
                    default="pretrained/ir_micro_synthetic.npz")
    ap.add_argument("--output_dir", type=str,
                    default="reports/quantize_transfer")
    args = ap.parse_args()

    from facerecognitionpipeline_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from facerecognitionpipeline_tpu.models.quantize import (
        default_calibration_faces,
    )
    from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder

    if not os.path.exists(args.weights):
        print(f"weights {args.weights} not found — run "
              f"examples/synthetic_end_to_end.py first", file=sys.stderr)
        return 1

    fp32 = FaceEmbedder(architecture=args.arch, model_path=args.weights)
    int8_synth = FaceEmbedder(
        architecture=args.arch, model_path=args.weights, quantize="int8",
    )  # default: synthetic clean-render calibration

    enroll = render_corpus(seed0=77_000, per_id=ENROLL_PER_ID)
    probes = render_corpus(seed0=88_000, per_id=PROBES_PER_ID)
    flat_probes = probes.reshape(-1, *probes.shape[2:])
    labels = np.repeat(np.arange(N_IDENTITIES), PROBES_PER_ID)

    # clean fp32 enrollment templates
    e = fp32.extract_embeddings_batch(
        enroll.reshape(-1, *enroll.shape[2:])
    ).reshape(N_IDENTITIES, ENROLL_PER_ID, 512)
    templates = e.mean(axis=1)
    templates /= np.linalg.norm(templates, axis=1, keepdims=True)

    def rank1(embs: np.ndarray) -> float:
        return float((np.argmax(embs @ templates.T, axis=1) == labels).mean())

    def cos(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return np.sum(a * b, axis=1)  # rows already unit-norm

    sweeps = {
        "brightness": [-60, -30, 0, 30, 60],
        "contrast": [0.4, 0.7, 1.0, 1.3],
        "noise": [0, 10, 20, 40],
    }
    rows = []
    for kind, levels in sweeps.items():
        for lv in levels:
            shifted = apply_shift(flat_probes, kind, lv, seed=7)
            ref = fp32.extract_embeddings_batch(shifted)
            q = int8_synth.extract_embeddings_batch(shifted)
            c_synth = cos(ref, q)
            # oracle: recalibrate the activation scales on THIS shifted
            # distribution (same weights) — isolates the transfer term
            calib = apply_shift(default_calibration_faces(), kind, lv, seed=8)
            int8_oracle = FaceEmbedder(
                architecture=args.arch, model_path=args.weights,
                quantize="int8", calib_faces=calib,
            )
            c_oracle = cos(ref, int8_oracle.extract_embeddings_batch(shifted))
            rows.append({
                "shift": kind,
                "level": float(lv),
                "cosine_synthcal_mean": round(float(c_synth.mean()), 5),
                "cosine_synthcal_min": round(float(c_synth.min()), 5),
                "cosine_oracle_mean": round(float(c_oracle.mean()), 5),
                "transfer_gap": round(
                    float(c_oracle.mean() - c_synth.mean()), 5
                ),
                "rank1_fp32": rank1(ref),
                "rank1_int8": rank1(q),
            })
            print(json.dumps(rows[-1]), flush=True)

    worst = min(rows, key=lambda r: r["cosine_synthcal_mean"])
    summary = {
        "arch": args.arch,
        "weights": args.weights,
        "n_probes": int(len(flat_probes)),
        "rows": rows,
        "worst_shift": {k: worst[k] for k in ("shift", "level")},
        "worst_cosine_synthcal_mean": worst["cosine_synthcal_mean"],
        "max_transfer_gap": max(r["transfer_gap"] for r in rows),
        "rank1_decisions_changed": any(
            r["rank1_int8"] != r["rank1_fp32"] for r in rows
        ),
    }
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "report.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nworst shift: {summary['worst_shift']} "
          f"cos={summary['worst_cosine_synthcal_mean']} "
          f"max transfer gap={summary['max_transfer_gap']} "
          f"rank-1 changed: {summary['rank1_decisions_changed']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
