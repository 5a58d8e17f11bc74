"""Gallery manager + device search tests, incl. reference-pickle compat."""

import json
import os
import pickle

import numpy as np
import pytest

from facerecognitionpipeline_tpu.gallery.manager import GalleryManager, StudentRecord
from facerecognitionpipeline_tpu.gallery.search import DeviceGallery, cosine_topk


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def gallery(tmp_path, rng):
    g = GalleryManager(gallery_path=str(tmp_path / "students.pkl"), verbose=False)
    for i in range(3):
        embs = _norm_rows(rng.normal(size=(5, 512)).astype(np.float32))
        g.add_student(f"S{i:03d}", f"Student {i}", embs, metadata={"class": "10A"})
    return g


def test_search_finds_enrolled_identity(gallery):
    target = gallery.get_student("S001")
    results = gallery.search(target.template_embedding, top_k=3)
    assert results[0][0] == "S001"
    assert results[0][2] == pytest.approx(1.0, abs=1e-4)
    assert len(results) == 3
    # sorted descending
    scores = [r[2] for r in results]
    assert scores == sorted(scores, reverse=True)


def test_search_batch(gallery):
    q = np.stack(
        [gallery.get_student(f"S{i:03d}").template_embedding for i in range(3)]
    )
    results = gallery.search_batch(q, top_k=2)
    assert [r[0][0] for r in results] == ["S000", "S001", "S002"]


def test_topk_clipped_to_gallery_size(gallery):
    results = gallery.search(gallery.get_student("S000").template_embedding, top_k=50)
    assert len(results) == 3


def test_update_modes(gallery, rng):
    before = gallery.get_student("S000").num_samples
    new = _norm_rows(rng.normal(size=(2, 512)).astype(np.float32))
    assert gallery.update_embeddings("S000", new, mode="append")
    assert gallery.get_student("S000").num_samples == before + 2
    assert gallery.update_embeddings("S000", new, mode="replace")
    assert gallery.get_student("S000").num_samples == 2
    assert gallery.update_embeddings("S000", new, mode="merge")
    assert not gallery.update_embeddings("NOPE", new)
    with pytest.raises(ValueError):
        gallery.update_embeddings("S000", new, mode="bogus")


def test_add_no_overwrite(gallery, rng):
    embs = _norm_rows(rng.normal(size=(2, 512)).astype(np.float32))
    assert not gallery.add_student("S000", "Dup", embs)
    assert gallery.add_student("S000", "Dup", embs, overwrite=True)
    assert gallery.get_student("S000").name == "Dup"


def test_delete_and_search_reflects_mutation(gallery):
    t = gallery.get_student("S002").template_embedding
    assert gallery.delete_student("S002")
    assert not gallery.delete_student("S002")
    results = gallery.search(t, top_k=3)
    assert all(r[0] != "S002" for r in results)


def test_save_load_roundtrip(gallery, tmp_path):
    gallery.save()
    g2 = GalleryManager(gallery_path=gallery.gallery_path, verbose=False)
    assert set(g2.students) == set(gallery.students)
    np.testing.assert_allclose(
        g2.get_student("S001").template_embedding,
        gallery.get_student("S001").template_embedding,
    )
    # JSON sidecar schema
    with open(gallery.gallery_path.replace(".pkl", ".json")) as f:
        meta = json.load(f)
    assert meta["num_students"] == 3
    assert "S001" in meta["students"]


def test_reference_pickle_compat(tmp_path, rng):
    """Pickles written with a foreign module's StudentRecord load fine."""

    class ForeignRecord:
        pass

    ForeignRecord.__qualname__ = "StudentRecord"
    ForeignRecord.__name__ = "StudentRecord"
    ForeignRecord.__module__ = "gallery_manager"

    rec = ForeignRecord()
    rec.__dict__.update(
        student_id="X001",
        name="Ref Student",
        embeddings=_norm_rows(rng.normal(size=(2, 512)).astype(np.float32)),
        template_embedding=_norm_rows(rng.normal(size=(512,)).astype(np.float32)),
        num_samples=2,
        enrollment_date="2025-01-01",
        last_updated="2025-01-01",
        metadata={},
    )
    path = tmp_path / "ref.pkl"
    import sys, types

    mod = types.ModuleType("gallery_manager")
    mod.StudentRecord = ForeignRecord
    sys.modules["gallery_manager"] = mod
    try:
        with open(path, "wb") as f:
            pickle.dump({"X001": rec}, f)
    finally:
        del sys.modules["gallery_manager"]

    g = GalleryManager(gallery_path=str(path), verbose=False)
    assert isinstance(g.get_student("X001"), StudentRecord) or hasattr(
        g.get_student("X001"), "template_embedding"
    )
    results = g.search(g.get_student("X001").template_embedding, top_k=1)
    assert results[0][0] == "X001"


def test_backup_roundtrip(gallery, tmp_path):
    gallery.save()
    json_path = gallery.export_for_backup(str(tmp_path / "backups"), "testmodel")
    assert os.path.exists(json_path)
    g2 = GalleryManager(gallery_path=str(tmp_path / "fresh.pkl"), verbose=False)
    g2.load_from_backup_json(json_path)
    assert set(g2.students) == set(gallery.students)
    np.testing.assert_allclose(
        g2.get_student("S000").template_embedding,
        gallery.get_student("S000").template_embedding,
        rtol=1e-6,
    )


def test_statistics(gallery, tmp_path):
    stats = gallery.get_statistics()
    assert stats["num_students"] == 3
    assert stats["total_embeddings"] == 15
    assert stats["avg_embeddings_per_student"] == 5.0
    # tmp_path, not a fixed /tmp name: GalleryManager pickle-loads whatever
    # already sits at its path, so a predictable world-writable location is
    # both flaky and a pickle-execution hazard
    assert GalleryManager(
        gallery_path=str(tmp_path / "empty" / "g.pkl"), verbose=False
    ).get_statistics()["num_students"] == 0


def test_quality_filter_and_outliers(rng, tmp_path):
    g = GalleryManager(
        gallery_path=str(tmp_path / "g.pkl"),
        aggregation_method="weighted_mean",
        verbose=False,
    )
    base = _norm_rows(rng.normal(size=(512,)).astype(np.float32))
    cluster = _norm_rows(base + 0.01 * rng.normal(size=(6, 512)).astype(np.float32))
    outlier = _norm_rows(rng.normal(size=(1, 512)).astype(np.float32))
    embs = np.vstack([cluster, outlier])

    # Row means include the zeroed diagonal and the outlier (reference
    # semantics), so a 6-member cluster of ~0.99 pairwise sim averages
    # ~(5*0.99)/7 ~= 0.71 while the outlier row averages ~0.
    kept = g._filter_quality_embeddings(embs, min_similarity=0.6)
    assert len(kept) == 6  # outlier dropped

    kept2 = g._remove_outliers(embs)
    assert len(kept2) < len(embs)

    # low-similarity set: keeps top 2
    noise = _norm_rows(rng.normal(size=(5, 512)).astype(np.float32))
    kept3 = g._filter_quality_embeddings(noise, min_similarity=0.9)
    assert len(kept3) == 2


def test_device_gallery_padding(rng):
    dg = DeviceGallery()
    t = _norm_rows(rng.normal(size=(5, 512)).astype(np.float32))
    dg.rebuild([f"id{i}" for i in range(5)], t)
    scores, ids = dg.search(t[2][None], top_k=5)
    assert ids[0][0] == "id2"
    assert scores.shape == (1, 5)
    # padded slots never surface
    assert all(i.startswith("id") for i in ids[0])


def test_cosine_topk_masks_padding(rng):
    t = np.zeros((8, 512), np.float32)
    t[0] = _norm_rows(rng.normal(size=(512,)).astype(np.float32))
    valid = np.zeros(8, bool)
    valid[0] = True
    scores, idx = cosine_topk(t[0][None], t, valid, 3)
    assert int(idx[0, 0]) == 0
    assert float(scores[0, 1]) < -1e8  # masked


def test_save_non_pkl_path_keeps_pickle_intact(tmp_path, rng):
    """A gallery path without '.pkl' must not have its JSON sidecar
    overwrite the pickle (save() used str.replace('.pkl', ...))."""
    import pickle

    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager

    path = tmp_path / "students.db"
    g = GalleryManager(gallery_path=str(path), verbose=False)
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    g.add_student("STU0001", "A Student", emb)
    g.save()
    with open(path, "rb") as f:
        students = pickle.load(f)  # must still BE a pickle
    assert "STU0001" in students
    assert (tmp_path / "students.json").exists()


def test_empty_gallery_search_single_1d_query():
    """A 1-D query against an EMPTY gallery must yield one empty result,
    not 512 (len() of the raw vector counted components as queries)."""
    from facerecognitionpipeline_tpu.gallery.search import DeviceGallery

    dg = DeviceGallery()
    dg.rebuild([], np.zeros((0, 512)))
    scores, ids = dg.search(np.zeros(512, np.float32), top_k=3)
    assert scores.shape == (1, 0)
    assert ids == [[]]


def test_outlier_removal_never_empties_the_set(rng):
    """A mutually-dissimilar set can push median*0.7 above every row's mean
    similarity; the degenerate empty mask must fall back to keeping all
    instead of producing an all-NaN template downstream."""
    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager

    g = GalleryManager(gallery_path="/tmp/t_outlier/g.pkl", verbose=False)
    # three near-orthogonal/opposed unit vectors: all pairwise cosines < 0
    e = np.zeros((3, 512), np.float32)
    e[0, 0] = 1.0
    e[1, 0], e[1, 1] = -0.5, np.sqrt(1 - 0.25)
    e[2, 0], e[2, 1] = -0.5, -np.sqrt(1 - 0.25)
    kept = g._remove_outliers(e)
    assert len(kept) == 3
    template = g._aggregate_embeddings(e)
    assert np.isfinite(template).all()


def test_weighted_mean_degenerate_set_falls_back_to_mean(tmp_path, rng):
    """Mutually dissimilar embeddings can sum their similarity weights to
    ~0 or negative; the template must stay finite and unit-norm (NaN
    templates outrank every real match in device top_k; a negative weight
    sum sign-flips the template)."""
    g = GalleryManager(
        gallery_path=str(tmp_path / "g.pkl"),
        aggregation_method="weighted_mean",
        verbose=False,
    )
    # orthogonal one-hot embeddings: off-diagonal sims are 0, so the mean
    # intra-similarity weights sum to ~1/N each row times... construct a
    # strictly negative-sum case too via sign flips
    e = np.zeros((4, 512), np.float32)
    for i in range(4):
        e[i, i] = 1.0
    e[1] = -e[0]  # rows 0 and 1 anti-correlate -> weight sum near zero
    assert g.add_student("X", "X", e)
    t = g.get_student("X").template_embedding
    assert np.all(np.isfinite(t))
    assert abs(np.linalg.norm(t) - 1.0) < 1e-3


def test_save_is_atomic_and_leaves_no_temp(gallery, tmp_path):
    """save() must never truncate the existing pickle before the new bytes
    exist (temp + os.replace), and must clean up its temp files."""
    path = str(tmp_path / "students.pkl")
    gallery.save(path)
    first = os.path.getsize(path)
    gallery.save(path)  # overwrite in place
    assert os.path.getsize(path) == first
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    assert leftovers == []
    with open(path, "rb") as f:
        assert len(pickle.load(f)) == 3


def test_update_embeddings_concurrent_appends_not_lost(tmp_path, rng):
    """Two threads appending to the same student must both land (the
    read-modify-write used to run outside the lock)."""
    import threading

    g = GalleryManager(gallery_path=str(tmp_path / "g.pkl"), verbose=False)
    base = _norm_rows(rng.normal(size=(2, 512)).astype(np.float32))
    g.add_student("S0", "Zero", base)

    n_threads, per_thread = 4, 8
    barrier = threading.Barrier(n_threads)

    def append():
        barrier.wait()
        for _ in range(per_thread):
            e = _norm_rows(rng.normal(size=(1, 512)).astype(np.float32))
            g.update_embeddings("S0", e, mode="append")

    threads = [threading.Thread(target=append) for _ in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert g.get_student("S0").embeddings.shape[0] == 2 + n_threads * per_thread


def test_device_gallery_snapshot_single_generation(rng):
    """snapshot() hands out one generation tuple; a rebuild must not be able
    to pair new ids with old templates."""
    dg = DeviceGallery()
    t1 = _norm_rows(rng.normal(size=(3, 512)).astype(np.float32))
    dg.rebuild(["a", "b", "c"], t1)
    ids, templates, valid, _ = dg.snapshot()
    dg.rebuild(["x"], t1[:1])
    # the held snapshot still describes the OLD generation coherently
    assert ids == ["a", "b", "c"]
    assert int(np.asarray(valid).sum()) == 3
    assert templates.shape[0] >= 3
    # and fresh reads see the new one
    assert dg.snapshot()[0] == ["x"]


def test_concurrent_mutation_not_lost_by_device_sync(rng):
    """A student added while another thread runs _sync_device must appear in
    the next search (the unsynchronized dirty-flag clear lost it before)."""
    import threading

    from facerecognitionpipeline_tpu.gallery.manager import GalleryManager

    g = GalleryManager(gallery_path="/tmp/t_sync/g.pkl", verbose=False)
    emb = rng.normal(size=(2, 512)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    g.add_student("S0", "Zero", emb)

    stop = threading.Event()

    def churn():
        i = 1
        while not stop.is_set():
            e = rng.normal(size=(1, 512)).astype(np.float32)
            e /= np.linalg.norm(e)
            g.add_student(f"S{i}", f"N{i}", e)
            i += 1

    t = threading.Thread(target=churn)
    t.start()
    try:
        for _ in range(30):
            g.device_snapshot()
    finally:
        stop.set()
        t.join(timeout=10)
    # after churn stops, one more sync must surface every enrolled student
    _, _, ids = g.device_snapshot()
    assert set(ids) == set(g.students.keys())
