"""Open-set recognition evaluation on HELD-OUT identities at scale.

VERDICT r4 #1, the accuracy half: after `examples/train_ir18_open_set.py`
produces a headline-family backbone trained on identity seeds 0..N-1, this
script measures what matters — whether the embedding space SEPARATES
identities the model has never seen:

* gallery: 200 held-out identities enrolled from 4 crops each;
* known probes: 10 fresh crops per enrolled identity (new pose/light);
* unknown probes: 60 further held-out identities x 10 crops (open set);
* conditions: clean + photometric/occlusion corruption batteries, so the
  curves are genuinely sloped instead of saturating;
* protocols: closed-set identification (rank-1/5, ROC-AUC, d'),
  verification (EER, TAR@FAR 0.1%/1%/10% — reference
  evaluate_models_v2.ipynb cell 7 protocol via evalharness), impostor
  rejection, and open-set DIR@FAR (detection-and-identification rate at
  thresholds set from the unknown-probe score distribution);
* tiers: fp32 and int8 (post-training quantization calibrated on the
  enrollment crops — the deployment calibration set).

Writes reports/openset_<arch>/report.json (+ plots). Regression-gated by
tests/test_open_set_trained.py when the trained weights are present.

Run: PYTHONPATH=. python examples/open_set_eval.py [--architecture ir_18]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from facerecognitionpipeline_tpu.evalharness.identification import (
    evaluate_impostors_comprehensive,
    evaluate_probes_comprehensive,
)
from facerecognitionpipeline_tpu.evalharness.verification import (
    evaluate_verification_comprehensive,
)
from facerecognitionpipeline_tpu.pipeline.embedder import FaceEmbedder
from facerecognitionpipeline_tpu.train.facegen import render_crop, sample_identity

HELD_OUT_OFFSET = 10_000  # must match examples/train_ir18_open_set.py
N_GALLERY = 200
N_UNKNOWN = 60
ENROLL_PER_ID = 4
PROBES_PER_ID = 10
THRESHOLDS = [round(t, 2) for t in np.arange(0.0, 0.951, 0.05)]


# ---------------------------------------------------------------- renders


def corrupt(images: np.ndarray, mode: str, rng: np.random.Generator) -> np.ndarray:
    """Photometric/occlusion batteries over uint8 RGB crops."""
    import cv2

    out = images.copy()
    if mode == "clean":
        return out
    for i in range(len(out)):
        img = out[i]
        if mode == "blur":
            out[i] = cv2.GaussianBlur(img, (9, 9), 2.5)
        elif mode == "lowlight":
            dark = img.astype(np.float32) * rng.uniform(0.25, 0.4)
            dark += rng.normal(0, 10, img.shape)
            out[i] = np.clip(dark, 0, 255).astype(np.uint8)
        elif mode == "noise":
            noisy = img.astype(np.float32) + rng.normal(0, 25, img.shape)
            out[i] = np.clip(noisy, 0, 255).astype(np.uint8)
        elif mode == "occlusion":
            h, w = img.shape[:2]
            ph, pw = int(h * 0.38), int(w * 0.38)
            y = int(rng.integers(0, h - ph))
            x = int(rng.integers(0, w - pw))
            patch = rng.integers(0, 255, size=3)
            img2 = img.copy()
            img2[y:y + ph, x:x + pw] = patch
            out[i] = img2
        elif mode == "jpeg":
            ok, enc = cv2.imencode(
                ".jpg", img[:, :, ::-1],
                [int(cv2.IMWRITE_JPEG_QUALITY), 12],
            )
            if ok:
                out[i] = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
        else:
            raise ValueError(f"unknown corruption mode {mode!r}")
    return out


def render_sets(seed: int = 7):
    """(enroll [G,E,112,112,3], known probes [G,P,...], unknown probes
    [U,P,...]) — all uint8 RGB, identities disjoint from training."""
    rng = np.random.default_rng(seed)
    gallery_ids = [sample_identity(HELD_OUT_OFFSET + i) for i in range(N_GALLERY)]
    unknown_ids = [
        sample_identity(HELD_OUT_OFFSET + N_GALLERY + i) for i in range(N_UNKNOWN)
    ]
    enroll = np.stack([
        np.stack([render_crop(ident, rng) for _ in range(ENROLL_PER_ID)])
        for ident in gallery_ids
    ])
    known = np.stack([
        np.stack([render_crop(ident, rng) for _ in range(PROBES_PER_ID)])
        for ident in gallery_ids
    ])
    unknown = np.stack([
        np.stack([render_crop(ident, rng) for _ in range(PROBES_PER_ID)])
        for ident in unknown_ids
    ])
    return enroll, known, unknown


# ---------------------------------------------------------------- scoring


def embed_sets(embedder, crops: np.ndarray) -> np.ndarray:
    """[N, K, 112, 112, 3] uint8 -> [N, K, 512] unit f32."""
    n, k = crops.shape[:2]
    flat = crops.reshape(n * k, *crops.shape[2:])
    embs = embedder.extract_embeddings_batch(list(flat))
    return np.asarray(embs, np.float32).reshape(n, k, -1)


def corpus_dict(embs: np.ndarray, prefix: str) -> dict:
    return {
        f"{prefix}{i:03d}": {"embeddings": embs[i]} for i in range(len(embs))
    }


def open_set_dir_far(
    gallery_mat: np.ndarray,
    known: np.ndarray,
    known_label: np.ndarray,
    unknown: np.ndarray,
    fars=(0.01, 0.05, 0.1),
) -> dict:
    """Detection-and-identification rate at thresholds calibrated so the
    UNKNOWN probes' accept rate equals each target FAR (the open-set
    protocol: an accepted unknown is a false alarm even if 'best match'
    exists)."""
    known_scores = known @ gallery_mat.T          # [P, G]
    unknown_scores = unknown @ gallery_mat.T      # [Q, G]
    k_best = known_scores.max(axis=1)
    k_pred = known_scores.argmax(axis=1)
    u_best = unknown_scores.max(axis=1)
    correct = k_pred == known_label
    out = {}
    for far in fars:
        tau = float(np.quantile(u_best, 1 - far))
        dir_rate = float(((k_best >= tau) & correct).mean())
        out[f"dir_at_far_{far}"] = round(dir_rate, 4)
        out[f"tau_at_far_{far}"] = round(tau, 4)
    out["unknown_mean_best"] = round(float(u_best.mean()), 4)
    out["known_mean_best"] = round(float(k_best.mean()), 4)
    return out


def evaluate_tier(embedder, enroll, known, unknown, conditions, seed=11):
    """All metrics for one embedder tier across corruption conditions."""
    rng = np.random.default_rng(seed)
    enroll_embs = embed_sets(embedder, enroll)       # [G, E, 512]
    gallery = corpus_dict(enroll_embs, "ID")
    gallery_mean = enroll_embs.mean(axis=1)
    gallery_mean /= np.linalg.norm(gallery_mean, axis=1, keepdims=True) + 1e-9

    results = {}
    for mode in conditions:
        kc = corrupt(known.reshape(-1, *known.shape[2:]), mode, rng)
        uc = corrupt(unknown.reshape(-1, *unknown.shape[2:]), mode, rng)
        ke = embed_sets(embedder, kc.reshape(known.shape))
        ue = embed_sets(embedder, uc.reshape(unknown.shape))

        probes = corpus_dict(ke, "ID")
        negatives = corpus_dict(ue, "UNK")
        ident = evaluate_probes_comprehensive(
            gallery, probes, THRESHOLDS, aggregation="mean"
        )
        ver = evaluate_verification_comprehensive(
            gallery, probes, negatives, THRESHOLDS, aggregation="mean"
        )
        rej = evaluate_impostors_comprehensive(
            gallery, negatives, THRESHOLDS, aggregation="mean"
        )
        df = ident["threshold_results"]
        flat_known = ke.reshape(-1, ke.shape[-1])
        labels = np.repeat(np.arange(len(ke)), ke.shape[1])
        osr = open_set_dir_far(
            gallery_mean, flat_known, labels,
            ue.reshape(-1, ue.shape[-1]),
        )
        results[mode] = {
            "rank1": round(float(df["rank1_accuracy"].iloc[0]), 4),
            "rank5": round(float(df["rank5_accuracy"].iloc[0]), 4),
            "mrr": round(float(df["mrr"].iloc[0]), 4),
            "roc_auc": round(float(ver["roc_auc"]), 4),
            "eer": round(float(ver["eer"]), 4),
            "tar_at_far_0.001": round(float(ver["tar_at_far_0.001"]), 4),
            "tar_at_far_0.01": round(float(ver["tar_at_far_0.01"]), 4),
            "tar_at_far_0.1": round(float(ver["tar_at_far_0.1"]), 4),
            "dprime": round(float(ver["dprime"]), 4),
            "genuine_mean": round(float(ver["genuine_mean"]), 4),
            "impostor_mean": round(float(ver["impostor_mean"]), 4),
            "impostor_rejection_at_tau": round(
                float(
                    rej["threshold_results"].loc[
                        rej["threshold_results"]["threshold"] == 0.5,
                        "rejection_rate",
                    ].iloc[0]
                ),
                4,
            ),
            **osr,
        }
        print(f"    {mode}: rank1 {results[mode]['rank1']:.3f} "
              f"EER {results[mode]['eer']:.3f} "
              f"DIR@FAR1% {results[mode]['dir_at_far_0.01']:.3f}", flush=True)
    return results


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--architecture", default="ir_18")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--conditions", nargs="*", default=[
        "clean", "blur", "lowlight", "noise", "occlusion", "jpeg",
    ])
    ap.add_argument("--skip_int8", action="store_true")
    args = ap.parse_args()
    weights = args.weights or f"pretrained/{args.architecture}_synthetic.npz"
    out_dir = args.out or f"reports/openset_{args.architecture}"
    if not os.path.exists(weights):
        print(f"weights not found: {weights} — run "
              f"examples/train_ir18_open_set.py first", file=sys.stderr)
        return 1

    print(f"Rendering held-out sets: {N_GALLERY} gallery + {N_UNKNOWN} "
          f"unknown identities ...", flush=True)
    enroll, known, unknown = render_sets()

    print(f"fp32 tier ({args.architecture}, {weights}):", flush=True)
    embedder = FaceEmbedder(architecture=args.architecture, model_path=weights)
    fp32 = evaluate_tier(embedder, enroll, known, unknown, args.conditions)

    report = {
        "architecture": args.architecture,
        "weights": weights,
        "protocol": {
            "n_gallery_identities": N_GALLERY,
            "n_unknown_identities": N_UNKNOWN,
            "enroll_per_id": ENROLL_PER_ID,
            "probes_per_id": PROBES_PER_ID,
            "held_out": "identity seeds disjoint from training by "
                        "construction (facegen id_offset)",
        },
        "fp32": fp32,
    }

    if not args.skip_int8:
        print("int8 tier (calibrated on enrollment crops):", flush=True)
        calib = enroll.reshape(-1, *enroll.shape[2:])[:256]
        embedder_q = FaceEmbedder(
            architecture=args.architecture, model_path=weights,
            quantize="int8", calib_faces=calib,
        )
        report["int8"] = evaluate_tier(
            embedder_q, enroll, known, unknown, args.conditions
        )
        drift = []
        probe_flat = known.reshape(-1, *known.shape[2:])[:128]
        f32e = embedder.extract_embeddings_batch(list(probe_flat))
        qe = embedder_q.extract_embeddings_batch(list(probe_flat))
        cos = np.sum(np.asarray(f32e) * np.asarray(qe), axis=1)
        report["int8_drift_cosine"] = {
            "mean": round(float(cos.mean()), 5),
            "min": round(float(cos.min()), 5),
        }

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    # curves: metric-vs-condition plot
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        conds = args.conditions
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for tier in [t for t in ("fp32", "int8") if t in report]:
            r = report[tier]
            axes[0].plot(conds, [r[c]["rank1"] for c in conds], "o-", label=tier)
            axes[1].plot(conds, [r[c]["eer"] for c in conds], "o-", label=tier)
            axes[2].plot(conds, [r[c]["dir_at_far_0.01"] for c in conds],
                         "o-", label=tier)
        for ax, title in zip(axes, ("rank-1", "EER", "DIR@FAR=1%")):
            ax.set_title(title)
            ax.grid(alpha=0.3)
            ax.legend()
            ax.tick_params(axis="x", rotation=30)
        fig.suptitle(
            f"Open-set eval: {args.architecture}, {N_GALLERY} held-out "
            f"identities + {N_UNKNOWN} unknown"
        )
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "curves.png"), dpi=120)
        plt.close(fig)
    except Exception as e:  # plots are a convenience, not the artifact
        print(f"plotting skipped: {e}", file=sys.stderr)

    print(f"\nReport -> {out_dir}/report.json")
    clean = fp32["clean"]
    print(f"headline (fp32 clean): rank1 {clean['rank1']:.3f} "
          f"EER {clean['eer']:.3f} TAR@FAR1% {clean['tar_at_far_0.01']:.3f} "
          f"DIR@FAR1% {clean['dir_at_far_0.01']:.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
