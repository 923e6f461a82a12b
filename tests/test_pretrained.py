"""Keras Xception -> Flax weight converter (models/pretrained.py).

Parity target: slideflow's ImageNet-initialized Keras Xception
(/root/reference/biscuit/hp.py:3-24). The round-trip tests inverse-generate
a Keras-layout weight file from a Flax init and assert the converter maps
it back bitwise onto a differently-seeded init — proving the name map is a
bijection that hits every backbone leaf with the right layout transforms.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_model_trainer import tiny_hp  # noqa: E402


def _flax_to_keras(params, batch_stats, arch):
    """Inverse of convert_keras_xception: Flax trees -> Keras layer dict."""
    from biscuit_tpu.models.pretrained import keras_layer_map

    def get(tree, path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    out = {}
    for flax_path, (keras_name, kind) in keras_layer_map(arch).items():
        if kind == "conv":
            out[keras_name] = {"kernel": get(params["backbone"],
                                             flax_path + ("kernel",))}
        elif kind == "sepconv":
            dw = get(params["backbone"], flax_path + ("depthwise", "kernel"))
            pw = get(params["backbone"], flax_path + ("pointwise", "kernel"))
            out[keras_name] = {
                "depthwise_kernel": dw.transpose(0, 1, 3, 2),
                "pointwise_kernel": pw,
            }
        else:
            from biscuit_tpu.models.pretrained import (
                _FLAX_BN_EPS, _KERAS_BN_EPS)

            out[keras_name] = {
                "gamma": get(params["backbone"], flax_path + ("scale",)),
                "beta": get(params["backbone"], flax_path + ("bias",)),
                "moving_mean": get(batch_stats["backbone"],
                                   flax_path + ("mean",)),
                # Inverse of the converter's epsilon compensation
                # (Keras BN eps 1e-3 vs flax 1e-5).
                "moving_variance": get(batch_stats["backbone"],
                                       flax_path + ("var",))
                - (_KERAS_BN_EPS - _FLAX_BN_EPS),
            }
    return out


def _write_npz(path, keras_dict):
    flat = {}
    for layer, arrays in keras_dict.items():
        for w, a in arrays.items():
            flat[f"{layer}/{w}"] = a
    np.savez(path, **flat)


def _write_h5(path, keras_dict):
    """Keras Model.save_weights layout: per-layer groups with
    layer_names/weight_names attrs and ':0'-suffixed dataset names."""
    import h5py

    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [k.encode() for k in keras_dict], dtype="S64")
        for layer, arrays in keras_dict.items():
            g = f.create_group(layer)
            wnames = []
            for w, a in arrays.items():
                name = f"{layer}/{w}:0"
                wnames.append(name.encode())
                g.create_dataset(name, data=a)
            g.attrs["weight_names"] = np.array(wnames, dtype="S96")


@pytest.fixture(scope="module")
def tiny_inits():
    """Two differently-seeded tiny-arch inits (template + donor)."""
    import jax

    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.train.trainer import init_model

    hp = tiny_hp()
    model = build_model(hp)
    p0, bs0 = init_model(model, hp, jax.random.PRNGKey(0))
    p1, bs1 = init_model(model, hp, jax.random.PRNGKey(1))
    return hp, model, (p0, bs0), (p1, bs1)


class TestNameMap:
    def test_full_xception_layer_inventory(self):
        """The real-arch map covers exactly the 80 weighted Keras layers."""
        from biscuit_tpu.models.pretrained import keras_layer_map

        m = keras_layer_map("xception")
        keras_names = [v[0] for v in m.values()]
        assert len(keras_names) == len(set(keras_names)) == 80
        # Named layers: block1 convs, sepconv blocks 2-14.
        expected = {"block1_conv1", "block1_conv1_bn",
                    "block1_conv2", "block1_conv2_bn"}
        for b in range(2, 5):
            for j in (1, 2):
                expected |= {f"block{b}_sepconv{j}", f"block{b}_sepconv{j}_bn"}
        for b in range(5, 13):
            for j in (1, 2, 3):
                expected |= {f"block{b}_sepconv{j}", f"block{b}_sepconv{j}_bn"}
        for b in (13, 14):
            for j in (1, 2):
                expected |= {f"block{b}_sepconv{j}", f"block{b}_sepconv{j}_bn"}
        # Unnamed shortcut convs in creation order (blocks 2,3,4,13).
        expected |= {"conv2d", "conv2d_1", "conv2d_2", "conv2d_3",
                     "batch_normalization", "batch_normalization_1",
                     "batch_normalization_2", "batch_normalization_3"}
        assert set(keras_names) == expected

    def test_middle_flow_numbering(self):
        from biscuit_tpu.models.pretrained import keras_layer_map

        m = keras_layer_map("xception")
        assert m[("middle0", "sep0")] == ("block5_sepconv1", "sepconv")
        assert m[("middle7", "sep2")] == ("block12_sepconv3", "sepconv")
        assert m[("exit_block", "res_conv")] == ("conv2d_3", "conv")
        assert m[("exit_sep1",)] == ("block14_sepconv2", "sepconv")

    def test_non_xception_arch_rejected(self):
        from biscuit_tpu.models.pretrained import keras_layer_map

        with pytest.raises(ValueError, match="Xception archs"):
            keras_layer_map("resnet50")


def _assert_trees_equal(a, b, atol=0.0):
    """Bitwise by default; batch_stats comparisons pass atol because the
    BN-epsilon round trip ((var - shift) + shift) is one f32 rounding."""
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves_with_path(b)
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(flat_a, flat_b):
        assert pa == pb
        if atol:
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=atol, err_msg=str(pa))
        else:
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=str(pa))


class TestRoundTrip:
    def test_npz_round_trip_bijection(self, tiny_inits, tmp_path):
        """Donor weights written in Keras layout land bitwise on the
        template init's backbone; the head keeps the template values."""
        from biscuit_tpu.models.pretrained import load_pretrained

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        path = str(tmp_path / "w.npz")
        _write_npz(path, _flax_to_keras(p1, bs1, model.arch))
        p2, bs2 = load_pretrained(p0, bs0, path, arch=model.arch)
        _assert_trees_equal(p2["backbone"], p1["backbone"])
        _assert_trees_equal(bs2["backbone"], bs1["backbone"], atol=1e-7)
        _assert_trees_equal(p2["head"], p0["head"])  # head untouched

    def test_h5_round_trip(self, tiny_inits, tmp_path):
        from biscuit_tpu.models.pretrained import load_pretrained

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        path = str(tmp_path / "w.h5")
        _write_h5(path, _flax_to_keras(p1, bs1, model.arch))
        p2, bs2 = load_pretrained(p0, bs0, path, arch=model.arch)
        _assert_trees_equal(p2["backbone"], p1["backbone"])
        _assert_trees_equal(bs2["backbone"], bs1["backbone"], atol=1e-7)

    def test_h5_no_layer_names_attr_natural_order(self, tmp_path):
        """The .h5 fallback (no layer_names attr) must yield GRAPH order
        for Keras auto-named layers (ADVICE r4): h5py lists groups
        alphabetically, where dense_10 sorts before dense_2 — with >=10
        equal-width Dense layers convert_keras_head's file-order
        structural matching would then load weights sideways with every
        shape still validating."""
        import h5py

        from biscuit_tpu.models.pretrained import read_keras_weights

        names = ["dense"] + [f"dense_{i}" for i in range(1, 12)]
        path = str(tmp_path / "flat.h5")
        with h5py.File(path, "w") as f:
            # Insert in shuffled order and write NO layer_names attr.
            for j, layer in enumerate(reversed(names)):
                g = f.create_group(layer)
                g.create_dataset(f"{layer}/kernel:0",
                                 data=np.full((2, 2), j, np.float32))
                g.create_dataset(f"{layer}/bias:0",
                                 data=np.zeros((2,), np.float32))
        got = list(read_keras_weights(path))
        assert got == names  # graph order, not ["dense", "dense_1",
        # "dense_10", "dense_11", "dense_2", ...]

    def test_loaded_model_runs(self, tiny_inits, tmp_path):
        """Converted weights produce the donor's forward outputs."""
        import jax.numpy as jnp

        from biscuit_tpu.models.pretrained import load_pretrained

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        path = str(tmp_path / "w.npz")
        _write_npz(path, _flax_to_keras(p1, bs1, model.arch))
        p2, bs2 = load_pretrained(p0, bs0, path, arch=model.arch)
        x = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
        f_donor = model.apply({"params": p1, "batch_stats": bs1}, x,
                              train=False, method="features")
        f_loaded = model.apply({"params": p2, "batch_stats": bs2}, x,
                               train=False, method="features")
        np.testing.assert_allclose(np.asarray(f_donor), np.asarray(f_loaded),
                                   rtol=1e-6)

    def test_missing_layer_reported(self, tiny_inits, tmp_path):
        from biscuit_tpu.models.pretrained import load_pretrained

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        kd = _flax_to_keras(p1, bs1, model.arch)
        del kd["block1_conv1"]
        path = str(tmp_path / "w.npz")
        _write_npz(path, kd)
        with pytest.raises(ValueError, match="block1_conv1"):
            load_pretrained(p0, bs0, path, arch=model.arch)

    def test_shape_mismatch_reported(self, tiny_inits, tmp_path):
        from biscuit_tpu.models.pretrained import load_pretrained

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        kd = _flax_to_keras(p1, bs1, model.arch)
        kd["block1_conv1"]["kernel"] = np.zeros((3, 3, 3, 99), np.float32)
        path = str(tmp_path / "w.npz")
        _write_npz(path, kd)
        with pytest.raises(ValueError, match="shape mismatch"):
            load_pretrained(p0, bs0, path, arch=model.arch)


class TestWiring:
    def test_hp_pretrained_path(self, tiny_inits, tmp_path):
        """init_model(hp.pretrained=<path>) grafts staged weights."""
        import jax

        from biscuit_tpu.train.trainer import init_model

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        path = str(tmp_path / "w.npz")
        _write_npz(path, _flax_to_keras(p1, bs1, model.arch))
        hp2 = tiny_hp(pretrained=path)
        p, bs = init_model(model, hp2, jax.random.PRNGKey(7))
        _assert_trees_equal(p["backbone"], p1["backbone"])

    def test_resolve_imagenet_via_env(self, tiny_inits, tmp_path,
                                      monkeypatch):
        from biscuit_tpu.models.pretrained import resolve_pretrained_path

        hp, model, (p0, bs0), (p1, bs1) = tiny_inits
        stage = tmp_path / "stage"
        stage.mkdir()
        _write_npz(str(stage / "xception_imagenet.npz"),
                   _flax_to_keras(p1, bs1, model.arch))
        monkeypatch.setenv("BISCUIT_PRETRAINED_DIR", str(stage))
        assert resolve_pretrained_path("imagenet").endswith(
            "xception_imagenet.npz")

    def test_resolve_missing_raises(self, monkeypatch, tmp_path):
        from biscuit_tpu.models.pretrained import resolve_pretrained_path

        monkeypatch.setenv("BISCUIT_PRETRAINED_DIR", str(tmp_path / "empty"))
        with pytest.raises(FileNotFoundError, match="stage"):
            resolve_pretrained_path("imagenet")
