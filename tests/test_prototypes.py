"""Clustering + prototype construction vs sklearn and hand-built cases."""

import numpy as np
import pytest

from distdiff_tpu.prototypes import (
    agglomerative_average,
    build_prototypes,
    load_prototypes,
    save_prototypes,
)


def _same_partition(a, b):
    """Label-permutation-invariant partition equality."""
    amap = {}
    for x, y in zip(a, b):
        if x in amap:
            if amap[x] != y:
                return False
        else:
            amap[x] = y
    return len(set(amap.values())) == len(amap)


def test_agglomerative_matches_sklearn():
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    rng = np.random.RandomState(0)
    for n, k in [(30, 3), (50, 5), (12, 3)]:
        x = np.concatenate(
            [rng.randn(n // 3, 8) + 6 * i for i in range(3)], axis=0
        ).astype(np.float32)
        ours = agglomerative_average(x, k)
        ref = sklearn_cluster.AgglomerativeClustering(
            n_clusters=k, linkage="average"
        ).fit(x).labels_
        assert _same_partition(ours, ref), (ours, ref)


def test_three_blobs():
    rng = np.random.RandomState(1)
    centers = np.array([[0, 0], [10, 0], [0, 10]], np.float32)
    x = np.concatenate([c + 0.1 * rng.randn(20, 2) for c in centers]).astype(
        np.float32
    )
    labels = agglomerative_average(x, 3)
    # each blob must be a single cluster
    for i in range(3):
        blob = labels[i * 20 : (i + 1) * 20]
        assert len(set(blob.tolist())) == 1
    assert len(set(labels.tolist())) == 3


def test_build_prototypes_shapes_and_small_class():
    rng = np.random.RandomState(2)
    feats = rng.randn(25, 16).astype(np.float32)
    labels = np.array([0] * 20 + [1] * 3 + [2] * 2)  # class 2 has < K samples
    g, l = build_prototypes(feats, labels, num_classes=3, k=3)
    assert g.shape == (3, 16) and l.shape == (3, 3, 16)
    np.testing.assert_allclose(g[0], feats[:20].mean(0), atol=1e-5)
    # small class: cluster means replicated, never zeros
    assert np.abs(l[2]).sum() > 0


def test_save_load_roundtrip_normalizes(tmp_path):
    rng = np.random.RandomState(3)
    g = rng.randn(4, 8).astype(np.float32) * 5
    l = rng.randn(4, 2, 8).astype(np.float32) * 5
    path = str(tmp_path / "protos.npz")
    save_prototypes(path, g, l)
    g2, l2 = load_prototypes(path)
    # loaded prototypes are L2-normalized rows (reference load behavior)
    np.testing.assert_allclose(np.linalg.norm(g2, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(l2, axis=-1), 1.0, atol=1e-5)
    # direction preserved
    cos = (g2 * (g / np.linalg.norm(g, axis=-1, keepdims=True))).sum(-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)
