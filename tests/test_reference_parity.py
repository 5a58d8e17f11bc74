"""Bit-level parity against the reference's REAL checked-in artifacts.

The reference repo ships gallery backups with actual AdaFace/ArcFace
embeddings (23 students x 8 x 512, four model configs) plus the
reference-computed `template_embedding` and `metadata.avg_similarity`.
Re-running OUR aggregation/enrollment formulas over the raw embeddings must
reproduce those stored values to float32-serialization precision — the
strongest accuracy evidence available without the (absent) model weights.

Empirical note (verified here): the stored templates reproduce with
aggregation_method='mean' to ~1e-8, NOT with 'weighted_mean' (err ~3e-4,
cos 0.999997) — i.e. the reference's checked-in galleries were built with
mean aggregation even though enroll_students.py:92 requests weighted_mean
(its GalleryManager falls back to mean for unknown methods only; the
artifacts evidently predate the weighted_mean setting).
"""

import glob
import json
import os

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager

BACKUPS = sorted(glob.glob("/root/reference/gallery/backups/*.json"))

pytestmark = pytest.mark.skipif(
    not BACKUPS, reason="reference gallery backups not mounted"
)


def _load(path):
    with open(path) as f:
        return json.load(f)["students"]


@pytest.mark.parametrize("path", BACKUPS, ids=[os.path.basename(p) for p in BACKUPS])
def test_template_aggregation_bit_parity(path, tmp_path):
    """Our add_student (mean aggregation + quality filter) reproduces every
    stored template_embedding from the raw embeddings (reference
    gallery_manager.py:297-317 formulas)."""
    students = _load(path)
    gm = GalleryManager(
        gallery_path=str(tmp_path / "g.pkl"),
        aggregation_method="mean",
        verbose=False,
    )
    for sid, rec in students.items():
        embs = np.asarray(rec["embeddings"], np.float32)
        stored = np.asarray(rec["template_embedding"], np.float32)
        gm.add_student(sid, rec["name"], embs, overwrite=True)
        ours = gm.students[sid].template_embedding
        np.testing.assert_allclose(ours, stored, atol=1e-6)


@pytest.mark.parametrize("path", BACKUPS, ids=[os.path.basename(p) for p in BACKUPS])
def test_avg_similarity_formula_parity(path):
    """The enrollment intra-class similarity (enroll_students.py:227-229)
    reproduces metadata.avg_similarity on every student."""
    for sid, rec in _load(path).items():
        embs = np.asarray(rec["embeddings"], np.float64)
        sims = embs @ embs.T
        avg = (sims.sum() - len(embs)) / (len(embs) * (len(embs) - 1))
        assert avg == pytest.approx(rec["metadata"]["avg_similarity"], abs=1e-6)


def test_real_embedding_eval_corpus_pipeline(tmp_path):
    """The committed real-embedding eval protocol (examples/
    real_embedding_eval.py): corpus built from a reference backup drives the
    full evaluate_model pass with perfect identification on real AdaFace
    embeddings and a working open-set impostor split."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "real_embedding_eval",
        os.path.join(os.path.dirname(__file__), "..", "examples",
                     "real_embedding_eval.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from facerecognitionpipeline_tpu.evalharness.pipeline import (
        evaluate_model,
        load_model_corpus,
    )

    model_dir = str(tmp_path / "adaface_ir_101")
    mod.build_corpus(BACKUPS[0], model_dir)
    corpus = load_model_corpus(model_dir)
    assert set(corpus["galleries"]) == {
        "oneshot_base", "oneshot_augmented", "fewshot_base", "fewshot_augmented"
    }
    res = evaluate_model(
        corpus, thresholds=[0.3, 0.5], aggregations=("mean",),
    )
    basic = res["basic_probe"]["fewshot_base"]["mean"]
    assert basic["threshold_results"]["rank1_accuracy"].iloc[0] == 1.0
    ver = res["verification"]["fewshot_base"]["mean"]
    assert ver["eer"] <= 0.05


def test_backup_roundtrip_real_embeddings(tmp_path):
    """load_from_backup_json on a reference backup, re-export, re-load:
    records and device search survive intact on real embeddings."""
    gm = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    gm.load_from_backup_json(BACKUPS[0])
    assert len(gm.students) == 23
    out = gm.export_for_backup(str(tmp_path / "bk"), backup_name="rt")
    gm2 = GalleryManager(gallery_path=str(tmp_path / "g2.pkl"), verbose=False)
    gm2.load_from_backup_json(out.replace(".pkl", ".json"))
    sid = next(iter(gm.students))
    np.testing.assert_allclose(
        gm2.students[sid].template_embedding,
        gm.students[sid].template_embedding,
        atol=1e-6,
    )
    # real-embedding search: each student's own template must match itself
    for sid, rec in list(gm.students.items())[:5]:
        top = gm.search(rec.template_embedding, top_k=1)
        assert top[0][0] == sid
        assert top[0][2] > 0.99
