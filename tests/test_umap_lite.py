"""Vendored minimal-UMAP quality tests (biscuit_tpu/stats/umap_lite.py).

Checks the properties Figure 6 depends on: cluster separation, local
neighborhood preservation, determinism, and the mosaic/slide-map wiring
(non-UMAP fallbacks must be loud in filenames)."""

import numpy as np
import pytest

from biscuit_tpu.stats.umap_lite import fit_ab, umap_embed


def two_clusters(n_per=120, d=50, gap=8.0, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(n_per, d)
    b = rng.randn(n_per, d)
    b[:, 0] += gap
    x = np.vstack([a, b])
    y = np.r_[np.zeros(n_per), np.ones(n_per)]
    return x, y


class TestFitAB:
    def test_default_curve_params_match_published(self):
        # umap-learn's documented values for spread=1, min_dist=0.1 are
        # a~1.577, b~0.895.
        a, b = fit_ab(1.0, 0.1)
        assert 1.3 < a < 1.9
        assert 0.75 < b < 1.0


class TestUmapEmbed:
    def test_separates_clusters(self):
        x, y = two_clusters()
        emb = umap_embed(x, seed=0, n_epochs=150)
        c0 = emb[y == 0].mean(axis=0)
        c1 = emb[y == 1].mean(axis=0)
        between = np.linalg.norm(c0 - c1)
        within = max(
            np.linalg.norm(emb[y == 0] - c0, axis=1).mean(),
            np.linalg.norm(emb[y == 1] - c1, axis=1).mean(),
        )
        assert between > 2.0 * within

    def test_neighborhood_preservation(self):
        # Trustworthiness-lite: most 5-NN in the embedding should be among
        # the 20-NN in the input space (random would be ~20/240).
        x, _ = two_clusters(n_per=120)
        emb = umap_embed(x, seed=0, n_epochs=150)

        def knn(a, k):
            d = ((a[:, None, :] - a[None, :, :]) ** 2).sum(-1)
            np.fill_diagonal(d, np.inf)
            return np.argsort(d, axis=1)[:, :k]

        hi = knn(x, 20)
        lo = knn(emb, 5)
        hits = np.mean([
            len(set(lo[i]) & set(hi[i])) / 5.0 for i in range(len(x))
        ])
        assert hits > 0.4

    def test_deterministic(self):
        x, _ = two_clusters(n_per=60)
        e1 = umap_embed(x, seed=3, n_epochs=60)
        e2 = umap_embed(x, seed=3, n_epochs=60)
        np.testing.assert_array_equal(e1, e2)

    def test_tiny_inputs(self):
        assert umap_embed(np.zeros((1, 8))).shape == (1, 2)
        assert umap_embed(np.zeros((2, 8))).shape == (2, 2)


class TestEmbedWiring:
    def test_embed_2d_uses_vendored_umap(self):
        from biscuit_tpu.mosaic import embed_2d

        x, _ = two_clusters(n_per=40)
        coords, method = embed_2d(x)
        assert coords.shape == (80, 2)
        # umap-learn absent in this environment -> vendored path
        assert method in ("umap", "umap_lite")

    def test_pca_fallback_is_loud_in_filename(self, tmp_path):
        from biscuit_tpu.mosaic import SlideMap

        coords = np.random.RandomState(0).randn(10, 2)
        meta = [{"slide": f"s{i}", "probs": [0.5, 0.5],
                 "uncertainty": [0.1, 0.1]} for i in range(10)]
        smap = SlideMap(coords, meta, embed_method="pca")
        out = smap.save(str(tmp_path / "umap_logits.png"))
        assert out.endswith("umap_logits_pca.png")
