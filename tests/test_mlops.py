"""Distributed logistic regression + PCA: correctness vs local oracles,
partition invariance, determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from logray.functions.classifier import fit_logreg, score_logreg
from logray.functions.pca import PCAModel, fit_pca, project_pca

GOOD_WORDS = ["clean", "prose", "insight", "measured", "article"]
BAD_WORDS = ["zzspam", "clickbait", "xxjunk", "lottery", "viagra"]


def _docs(n=400, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        good = bool(i % 2)
        vocab = GOOD_WORDS if good else BAD_WORDS
        words = list(rng.choice(vocab, size=12)) + ["the", "and", "of"]
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words), "label": good})
    return rows


@pytest.fixture()
def labeled_docs(ray_session):
    import ray.data as rd

    return rd.from_items(_docs())


def test_logreg_learns_separable_labels(labeled_docs):
    model = fit_logreg(labeled_docs, "label", dim=512, epochs=40, lr=8.0,
                       id_col="doc_id")
    assert model.losses[-1] < model.losses[0] * 0.5  # converging
    scored = score_logreg(labeled_docs, model).to_pandas()
    acc = (scored["quality_pred"] == scored["label"]).mean()
    assert acc == 1.0


def test_logreg_binary_features_length_invariant_margin(ray_session):
    """Binary presence features classify long documents where the mean
    features' 1/len margin stalls: one marker token among 300 words."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    filler = ["alpha", "beta", "gamma", "delta", "test", "word"]
    rows = []
    for i in range(200):
        words = list(rng.choice(filler, size=300))
        if i % 2:
            words.append("qmark")
        rows.append({"doc_id": i, "text": " ".join(words), "label": bool(i % 2)})
    ds = rd.from_items(rows)
    model = fit_logreg(ds, "label", dim=512, epochs=20, lr=5.0,
                       id_col="doc_id", features="binary")
    scored = score_logreg(ds, model, features="binary").to_pandas()
    assert (scored["quality_pred"] == scored["label"]).all()


def test_logreg_checkpoint_resume_bitwise(ray_session, tmp_path):
    """A fit killed mid-way resumes from its epoch checkpoint and ends
    bitwise-equal to an uninterrupted fit; config mismatch refuses."""
    import ray.data as rd

    rows = _docs(n=100)
    ds = rd.from_items(rows, override_num_blocks=3)
    kw = dict(dim=128, epochs=6, lr=3.0, id_col="doc_id",
              features="binary")
    full = fit_logreg(ds, "label", **kw)

    ckpt = str(tmp_path / "fit.npz")
    fit_logreg(ds, "label", dim=128, epochs=4, lr=3.0, id_col="doc_id",
               features="binary", checkpoint_path=ckpt)  # "crash" after 4
    resumed = fit_logreg(ds, "label", **kw, checkpoint_path=ckpt)
    np.testing.assert_array_equal(full.weights, resumed.weights)
    assert full.bias == resumed.bias
    assert full.losses == resumed.losses

    with pytest.raises(ValueError, match="different fit config"):
        fit_logreg(ds, "label", dim=128, epochs=6, lr=9.9, id_col="doc_id",
                   features="binary", checkpoint_path=ckpt)


def test_logreg_null_label_raises(ray_session):
    import ray.data as rd

    rows = _docs(n=20)
    rows[3]["label"] = None
    with pytest.raises(Exception, match="null labels"):
        fit_logreg(rd.from_items(rows), "label", dim=64, epochs=1,
                   id_col="doc_id")


def test_score_defaults_to_fitted_feature_mode(labeled_docs):
    model = fit_logreg(labeled_docs, "label", dim=256, epochs=5,
                       id_col="doc_id", features="binary")
    assert model.features == "binary"
    a = score_logreg(labeled_docs, model).to_pandas()  # no features arg
    b = score_logreg(labeled_docs, model, features="binary").to_pandas()
    assert (a.sort_values("doc_id")["quality_prob"].to_numpy()
            == b.sort_values("doc_id")["quality_prob"].to_numpy()).all()


def test_logreg_gradient_partition_invariant(ray_session):
    """The fitted model is identical (bitwise) whether the corpus is in
    1 block or 8 — the canonical sorted driver fold removes scheduling
    from the float association."""
    import ray.data as rd

    rows = _docs(n=120)
    m1 = fit_logreg(rd.from_items(rows, override_num_blocks=1), "label",
                    dim=256, epochs=5, id_col="doc_id")
    m8 = fit_logreg(rd.from_items(rows, override_num_blocks=8), "label",
                    dim=256, epochs=5, id_col="doc_id")
    np.testing.assert_allclose(m1.weights, m8.weights, rtol=1e-12, atol=1e-15)
    assert abs(m1.bias - m8.bias) < 1e-12


def test_logreg_matches_local_full_batch_gd(ray_session):
    """One epoch of the distributed fit == one epoch of a local numpy
    full-batch GD over the same hashed features."""
    import ray.data as rd

    from logray.functions.dsir import _feature_buckets

    rows = _docs(n=60)
    dim, lr, l2 = 128, 2.0, 1e-6
    ds = rd.from_items(rows, override_num_blocks=4)
    got = fit_logreg(ds, "label", dim=dim, epochs=1, lr=lr, l2=l2,
                     id_col="doc_id")

    t = pa.table({
        "doc_id": [r["doc_id"] for r in rows],
        "text": [r["text"] for r in rows],
    })
    parent, bucket = _feature_buckets(t, "text", dim)
    per_doc = np.bincount(parent, minlength=len(rows)).astype(float)
    val = 1.0 / per_doc[parent]
    y = np.array([float(r["label"]) for r in rows])
    # w=0 start: p = 0.5 everywhere
    err = 0.5 - y
    gw = np.zeros(dim)
    np.add.at(gw, bucket, val * err[parent])
    want_w = -lr * gw / len(rows)
    want_b = -lr * err.sum() / len(rows)
    np.testing.assert_allclose(got.weights, want_w, rtol=1e-9, atol=1e-12)
    assert abs(got.bias - want_b) < 1e-12


def test_logreg_tree_fold_close_to_exact(labeled_docs):
    exact = fit_logreg(labeled_docs, "label", dim=256, epochs=3,
                       id_col="doc_id")
    folded = fit_logreg(labeled_docs, "label", dim=256, epochs=3,
                        id_col="doc_id", tree_fold=True)
    np.testing.assert_allclose(exact.weights, folded.weights, rtol=1e-9,
                               atol=1e-12)


def test_logreg_pca_artifact_roundtrip(ray_session, tmp_path):
    """Persisted classifier / PCA models reload and score bit-identically
    (and a wrong-kind load refuses)."""
    import ray.data as rd

    from logray.state.artifacts import (load_logreg, load_pca, save_logreg,
                                        save_pca)

    ds = rd.from_items(_docs(n=80))
    model = fit_logreg(ds, "label", dim=256, epochs=5, id_col="doc_id",
                       features="binary")
    save_logreg(model, str(tmp_path / "clf.npz"))
    loaded = load_logreg(str(tmp_path / "clf.npz"))
    assert loaded.features == "binary" and loaded.dim == model.dim
    a = score_logreg(ds, model, features="binary").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    b = score_logreg(ds, loaded, features=loaded.features).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert (a["quality_prob"] == b["quality_prob"]).all()

    x, rows = _vec_rows(n=60)
    eds = rd.from_items(rows)
    pca = fit_pca(eds, k=2, id_col="vec_id")
    save_pca(pca, str(tmp_path / "pca.npz"))
    lp = load_pca(str(tmp_path / "pca.npz"))
    np.testing.assert_array_equal(lp.components, pca.components)
    p1 = project_pca(eds, pca).to_pandas().sort_values("vec_id")
    p2 = project_pca(eds, lp).to_pandas().sort_values("vec_id")
    assert all((np.asarray(u) == np.asarray(v)).all()
               for u, v in zip(p1["pca"], p2["pca"]))

    with pytest.raises(ValueError):
        load_pca(str(tmp_path / "clf.npz"))  # wrong kind refuses


def _vec_rows(n=300, d=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic gaussian: known principal axes
    scales = np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    x = rng.normal(size=(n, d)) * scales @ q.T + rng.normal(size=d)
    return x, [{"vec_id": i, "embedding": list(map(float, x[i]))}
               for i in range(n)]


def test_pca_matches_numpy_exactly(ray_session):
    import ray.data as rd

    x, rows = _vec_rows()
    model = fit_pca(rd.from_items(rows, override_num_blocks=5), k=3,
                    id_col="vec_id")
    # local oracle: same covariance, same eigh
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    comp = evecs[:, order]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(3)])
    comp = comp * flip
    np.testing.assert_allclose(model.mean, mean, rtol=1e-9)
    np.testing.assert_allclose(model.components, comp, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(model.explained_variance,
                               np.maximum(evals[order], 0), rtol=1e-9)
    # components orthonormal, variance descending
    np.testing.assert_allclose(model.components.T @ model.components,
                               np.eye(3), atol=1e-10)
    assert (np.diff(model.explained_variance) <= 1e-12).all()


def test_pca_projection_and_whitening(ray_session):
    import ray.data as rd

    x, rows = _vec_rows(n=200)
    ds = rd.from_items(rows, override_num_blocks=3)
    model = fit_pca(ds, k=2, id_col="vec_id")
    out = project_pca(ds, model, whiten=True).to_pandas()
    assert "embedding" not in out.columns  # wide input dropped
    y = np.stack(out.sort_values("vec_id")["pca"].to_numpy())
    assert y.shape == (200, 2)
    # whitened: unit variance per axis (ddof=1 matches fit)
    np.testing.assert_allclose(y.var(axis=0, ddof=1), 1.0, rtol=1e-6)
    # projection reproduces local (x - mean) @ comp * scale
    want = (x - model.mean) @ model.components
    want = want / np.sqrt(model.explained_variance + 1e-12)
    np.testing.assert_allclose(y, want, rtol=1e-7, atol=1e-9)


def test_pca_partition_invariant(ray_session):
    import ray.data as rd

    _, rows = _vec_rows(n=150)
    m1 = fit_pca(rd.from_items(rows, override_num_blocks=1), k=2,
                 id_col="vec_id")
    m6 = fit_pca(rd.from_items(rows, override_num_blocks=6), k=2,
                 id_col="vec_id")
    np.testing.assert_allclose(m1.components, m6.components, rtol=1e-9,
                               atol=1e-12)


def test_pca_input_validation(ray_session):
    import ray.data as rd

    _, rows = _vec_rows(n=10)
    ds = rd.from_items(rows)
    with pytest.raises(ValueError, match="out of range"):
        fit_pca(ds, k=99)
    ragged = rd.from_items([{"vec_id": 0, "embedding": [1.0, 2.0]},
                            {"vec_id": 1, "embedding": [1.0]}])
    with pytest.raises(Exception, match="ragged|inconsistent"):
        fit_pca(ragged, k=1)
