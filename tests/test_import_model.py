"""Full-model import (models/pretrained.load_pretrained_full +
cli/import_model): the switchover path for the published pretrained model
(reference README:19-20 points at HF lung-adeno-squam-v1, a slideflow
tf.keras Xception + Dense head). Validated against the independent numpy
Keras graph of test_keras_numpy_forward extended with a Dense head —
trunk layout, BN-eps compensation, and the structural head matcher must
all be right for logits to agree."""

from __future__ import annotations

import numpy as np
import pytest
from test_keras_numpy_forward import (
    _write_npz,
    make_keras_weights,
    relu,
    xception_forward,
)


def make_head_weights(feat_dim, widths, num_classes, rng):
    """Dense head weights under Keras auto-names (dense, dense_1, ...) in
    graph order: hidden widths then the logits layer."""
    w = {}
    cin = feat_dim
    dims = list(widths) + [num_classes]
    for i, cout in enumerate(dims):
        name = "dense" if i == 0 else f"dense_{i}"
        w[name] = {
            "kernel": rng.normal(0, 1.0 / np.sqrt(cin),
                                 (cin, cout)).astype(np.float32),
            "bias": rng.normal(0, 0.1, cout).astype(np.float32),
        }
        cin = cout
    return w


def head_forward(feats, w, n_hidden):
    h = feats
    for i in range(n_hidden):
        name = "dense" if i == 0 else f"dense_{i}"
        h = relu(h @ w[name]["kernel"] + w[name]["bias"])
    name = "dense" if n_hidden == 0 else f"dense_{n_hidden}"
    return h @ w[name]["kernel"] + w[name]["bias"]


@pytest.fixture(scope="module")
def full_export(tmp_path_factory):
    """A full-model export (trunk + 1x16 head + 2-class logits) for the
    tiny arch, plus its numpy-forward reference logits."""
    from biscuit_tpu.models.xception import ARCHS

    cfg = ARCHS["xception_tiny"]
    rng = np.random.default_rng(11)
    w = make_keras_weights(cfg, rng)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    feats = xception_forward(x, w, cfg)
    w.update(make_head_weights(feats.shape[1], [16], 2, rng))
    logits = head_forward(feats, w, n_hidden=1)
    path = str(tmp_path_factory.mktemp("full_export") / "full.npz")
    _write_npz(path, w)
    return path, x, logits


class TestFullModelImport:
    def test_logits_match_numpy_keras(self, full_export):
        import jax

        from biscuit_tpu.models.pretrained import load_pretrained_full
        from biscuit_tpu.models.xception import XceptionClassifier
        from biscuit_tpu.train.trainer import init_model

        path, x, want = full_export

        class HP:
            model = "xception_tiny"
            tile_px = 32
            hidden_layers = 1
            hidden_layer_width = 16
            dropout = 0.0
            compute_dtype = "float32"
            pretrained = None

        model = XceptionClassifier(
            arch="xception_tiny", num_classes=2, hidden_layers=1,
            hidden_width=16, dropout=0.0, compute_dtype=np.float32)
        params, stats = init_model(model, HP(), jax.random.PRNGKey(0))
        params, stats = load_pretrained_full(params, stats, path,
                                             arch="xception_tiny")
        got = np.asarray(model.apply(
            {"params": params, "batch_stats": stats}, x, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_head_count_mismatch_fails_loudly(self, full_export):
        import jax

        from biscuit_tpu.models.pretrained import load_pretrained_full
        from biscuit_tpu.models.xception import XceptionClassifier
        from biscuit_tpu.train.trainer import init_model

        path, _, _ = full_export

        class HP:
            model = "xception_tiny"
            tile_px = 32
            hidden_layers = 2  # export has 1 hidden layer
            hidden_layer_width = 16
            dropout = 0.0
            compute_dtype = "float32"
            pretrained = None

        model = XceptionClassifier(
            arch="xception_tiny", num_classes=2, hidden_layers=2,
            hidden_width=16, dropout=0.0, compute_dtype=np.float32)
        params, stats = init_model(model, HP(), jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="Dense layers"):
            load_pretrained_full(params, stats, path, arch="xception_tiny")

    def test_cli_import_then_serve(self, full_export, tmp_path):
        """import_model CLI -> standard checkpoint dir -> servable export
        -> scored logits still match the numpy Keras graph."""
        import jax
        from click.testing import CliRunner

        from biscuit_tpu import serve
        from biscuit_tpu.cli.import_model import main
        from biscuit_tpu.train.trainer import load_checkpoint

        path, x, want = full_export
        r = CliRunner().invoke(main, [
            path, str(tmp_path / "models"),
            "--arch", "xception_tiny", "--tile-px", "32", "--tile-um", "32",
            "--hidden-layers", "1", "--hidden-width", "16",
            "--normalizer", "none", "--uq-samples", "4",
        ])
        assert r.exit_code == 0, r.output
        mdir = r.output.strip().splitlines()[-1]

        model, params, stats, hp, _meta = load_checkpoint(mdir)
        assert hp.uq and hp.uq_samples == 4 and hp.normalizer is None
        got = np.asarray(model.apply(
            {"params": params, "batch_stats": stats},
            x.astype(np.float32), train=False))
        # bf16 trunk compute (the published serving dtype) vs the f32
        # numpy graph: agreement at bf16 resolution proves the weights
        # landed; a head-mapping bug would be O(1) off.
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

        art = serve.export_servable(mdir, batch_size=4, use_fused=False)
        sv = serve.load_servable(art)
        m, s = sv(np.random.default_rng(0).integers(
            0, 256, (4, 32, 32, 3), dtype=np.uint8))
        assert m.shape == (4, 2) and np.isfinite(m).all()
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-2)
