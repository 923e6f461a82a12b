"""MC-dropout uncertainty quantification: K stochastic passes on-chip.

Replaces slideflow's UQ path (SURVEY.md §2.3 E5/E6): with ``hp.uq=True`` the
reference runs K=30 full stochastic forward passes per tile through
TensorFlow and reduces per-tile softmax mean ('y_pred') and std
('uncertainty') on host.

TPU-first redesign — the published model's dropout lives exclusively in the
hidden head (hp.py:11; slideflow builds Dense+Dropout hidden layers on top
of a dropout-free Xception trunk), so the MC posterior over predictions is
exactly reproduced by running the convolutional trunk ONCE per tile and
vmapping K dropout-sampled head passes over the pooled features:

    naive   K=30 full passes:  ~252 GFLOPs/tile  (30 x 8.4 GFLOP trunk)
    here    1 trunk + 30 heads: ~8.6 GFLOPs/tile  (head is 2x1024 MLP)

i.e. a ~29x algorithmic reduction before any kernel tuning, with bitwise-
identical distribution of outputs (same stochastic graph). A fused Pallas
kernel for the K-pass head lives in biscuit_tpu.ops.mcd_head and is used
automatically for the published head shape on TPU; the lax fallback is
used elsewhere. ``mc_dropout_full`` runs the naive full-pass variant for
cross-checking.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.normalize import make_normalizer


def mc_dropout_predict(model, params, batch_stats, x, key, k: int = 30,
                       use_pallas: Optional[bool] = None,
                       fused_trunk: Optional[bool] = None,
                       int8_qw=None):
    """(mean softmax, std softmax) over k dropout samples; trunk runs once.

    Args:
        x: preprocessed (normalized+standardized) f32 batch (B, H, W, 3).
        fused_trunk: run the Xception middle flow through the fused Pallas
            kernel (ops/fused_sepconv.py). Default: on for Xception archs on
            a real TPU (set BISCUIT_NO_FUSED_MIDDLE=1 to disable).
        int8_qw: calibrated w8a8 trunk weights (ops/int8_trunk.py — OPT-IN
            quantized inference; prepare via calibrate/prepare_int8_trunk).
            fused_trunk still selects the bf16 middle-flow backend.
    Returns:
        (probs_mean (B, C), probs_std (B, C)) — slideflow's 'y_pred' and
        'uncertainty' columns.
    """
    if int8_qw is not None:
        from ..models.xception import ARCHS
        from ..ops.int8_trunk import trunk_features_int8

        if model.arch not in ARCHS:
            raise ValueError("int8 trunk requires an Xception arch")
        feats = trunk_features_int8(model, params, batch_stats, x, int8_qw,
                                    fused_trunk=fused_trunk)
        return mc_dropout_head(model, params, batch_stats, feats, key, k,
                               use_pallas=use_pallas)
    feats = trunk_features(model, params, batch_stats, x,
                           fused_trunk=fused_trunk)
    return mc_dropout_head(model, params, batch_stats, feats, key, k,
                           use_pallas=use_pallas)


def trunk_features(model, params, batch_stats, x,
                   fused_trunk: Optional[bool] = None):
    """Deterministic pooled-trunk features with the same backend selection
    as :func:`mc_dropout_predict` (fused Pallas middle flow on a real TPU
    for Xception archs, XLA otherwise). Shared by live UQ inference, the
    feature/mosaic dump (mosaic.py E9), and servable export (serve.py)."""
    if fused_trunk is None:
        from ..models.xception import ARCHS
        from ..ops.fused_sepconv import use_fused_middle

        fused_trunk = use_fused_middle() and model.arch in ARCHS
    if fused_trunk:
        from ..ops.fused_sepconv import trunk_features_fused

        return trunk_features_fused(model, params, batch_stats, x)
    variables = {"params": params, "batch_stats": batch_stats}
    return model.apply(variables, x, train=False, method="features")


def mc_dropout_head(model, params, batch_stats, feats, key, k: int = 30,
                    use_pallas: Optional[bool] = None):
    """K dropout-sampled head passes over precomputed features."""
    if use_pallas is None:
        use_pallas = _pallas_applicable(model, feats)
    if use_pallas:
        from ..ops.mcd_head import mcd_head_pallas

        return mcd_head_pallas(params["head"], feats, key, k=k,
                               dropout=model.dropout)

    variables = {"params": params, "batch_stats": batch_stats}

    def one_pass(rng):
        logits = model.apply(
            variables, feats, mc_dropout=True, rngs={"dropout": rng},
            method="head_logits",
        )
        return jax.nn.softmax(logits, axis=-1)

    probs = jax.vmap(one_pass)(jax.random.split(key, k))  # (K, B, C)
    return probs.mean(axis=0), probs.std(axis=0)


def mc_dropout_full(model, params, batch_stats, x, key, k: int = 30):
    """Naive K full forward passes (reference-equivalent control path)."""
    variables = {"params": params, "batch_stats": batch_stats}

    def one_pass(rng):
        logits = model.apply(
            variables, x, train=False, mc_dropout=True,
            rngs={"dropout": rng},
        )
        return jax.nn.softmax(logits, axis=-1)

    probs = jax.vmap(one_pass)(jax.random.split(key, k))
    return probs.mean(axis=0), probs.std(axis=0)


def _pallas_applicable(model, feats) -> bool:
    """The fused Pallas head kernel covers the published head shape: exactly
    two hidden layers with lane-aligned (x128) widths, on a real TPU."""
    if jax.default_backend() != "tpu":
        return False
    try:
        return (
            model.hidden_layers == 2
            and feats.ndim == 2
            and feats.shape[-1] % 128 == 0
            and model.hidden_width % 128 == 0
        )
    except Exception:
        return False


class UncertaintyInterface:
    """Standalone per-tile UQ inference over a saved model.

    Stand-in for sf.model.tensorflow.UncertaintyInterface
    (/root/reference/results.py:234-257): callable on a batch of RGB tiles,
    returns (mean softmax, uncertainty); carries ``wsi_normalizer``.
    """

    def __init__(self, model_path: str, k: Optional[int] = None,
                 use_pallas: Optional[bool] = None,
                 int8_trunk: Optional[bool] = None,
                 calib_tiles: Optional[int] = None,
                 calibration_path: Optional[str] = None):
        from .trainer import load_checkpoint

        (self.model, self.params, self.batch_stats,
         self.hp, self.meta) = load_checkpoint(model_path)
        self.k = k if k is not None else self.hp.uq_samples
        self.wsi_normalizer = make_normalizer(self.hp.normalizer)
        self._key = jax.random.PRNGKey(0)
        if int8_trunk is None:
            from ..ops.int8_trunk import use_int8_trunk

            int8_trunk = use_int8_trunk()
        self._int8 = bool(int8_trunk)
        # w8a8 calibration accumulates per-site absmax over the first
        # >=_CALIB_MIN_TILES tiles (answered through the exact f32 path so
        # calibration costs no accuracy), then freezes the quantized
        # weights. This bounds the order-dependence of lazy calibration: a
        # single unrepresentative first batch (e.g. one background tile)
        # can no longer pin hard-clipping scales for the whole run.
        # calibration_path makes quantized serving deterministic across
        # processes: if the JSON exists (and matches these weights and the
        # current quant-middle setting) its scales are loaded and the
        # quantized trunk is ready from the first batch (no per-process
        # f32 warmup); otherwise calibration runs as usual and the frozen
        # scales are saved there for the next process.
        self._qw = None
        self._calib = None
        self._scales = None
        self._model_path = model_path
        self._digest = None
        self._calibration_path = calibration_path
        if calib_tiles is not None:
            self._CALIB_MIN_TILES = int(calib_tiles)
        if self._int8 and calibration_path is not None and os.path.exists(
                calibration_path):
            from ..ops.int8_trunk import prepare_int8_trunk

            scales = self._load_calibration(calibration_path)
            if scales is not None:
                try:
                    qw = prepare_int8_trunk(
                        self.model, self.params, self.batch_stats, scales)
                except (KeyError, TypeError, ValueError) as e:
                    # A blob that passed the format/digest guards can still
                    # be incomplete (hand-edited, future revision): missing
                    # or non-numeric per-site scales surface here. Fall back
                    # to recalibration rather than aborting serving.
                    from ..utils_log import log

                    log.warning("int8 calibration at %s is unusable (%s); "
                                "recalibrating", calibration_path, e)
                else:
                    self._scales = scales
                    self._qw = jax.device_put(qw)

        normalizer = self.wsi_normalizer

        def _infer(params, batch_stats, images_u8, key, qw=None):
            from ..data.normalize import inference_preprocess

            x = inference_preprocess(images_u8, normalizer)
            return mc_dropout_predict(
                self.model, params, batch_stats, x, key, k=self.k,
                use_pallas=use_pallas, int8_qw=qw,
            )

        self._infer = jax.jit(_infer)

    _CALIB_MIN_TILES = 256

    def _int8_weights(self, tiles):
        """Accumulating w8a8 calibration (ops/int8_trunk.Int8Calibrator).
        Returns None while still calibrating (callers use the f32 path)."""
        if self._qw is None:
            from ..data.normalize import inference_preprocess
            from ..ops.int8_trunk import Int8Calibrator, prepare_int8_trunk

            if self._calib is None:
                self._calib = Int8Calibrator(
                    self.model, self.params, self.batch_stats)
            self._calib.update(
                inference_preprocess(tiles, self.wsi_normalizer))
            if self._calib.n_tiles >= self._CALIB_MIN_TILES:
                self._scales = self._calib.scales()
                self._qw = jax.device_put(prepare_int8_trunk(
                    self.model, self.params, self.batch_stats,
                    self._scales))
                self._calib = None
                if self._calibration_path is not None:
                    try:
                        self.save_calibration(self._calibration_path)
                    except OSError as e:
                        # Persistence is an optimization — an unwritable
                        # path must not abort serving (qw is frozen in
                        # memory either way).
                        from ..utils_log import log

                        log.warning("could not save int8 calibration to "
                                    "%s: %s", self._calibration_path, e)
            # This batch contributed to calibration — answer it through
            # the exact f32 path regardless of whether we just froze.
            return None
        return self._qw

    def _weights_digest(self) -> Optional[str]:
        """blake2b of the checkpoint weights file — fingerprints saved
        calibration scales against the exact weights they were derived
        from (stale scales silently clip activations on retrained
        weights)."""
        if self._digest is None:
            import hashlib

            p = os.path.join(self._model_path, "model.msgpack")
            if not os.path.exists(p):
                return None
            h = hashlib.blake2b(digest_size=16)
            with open(p, "rb") as f:
                for chunk in iter(lambda: f.read(1 << 20), b""):
                    h.update(chunk)
            self._digest = h.hexdigest()
        return self._digest

    def _load_calibration(self, path: str):
        """Return the saved scales, or None (-> recalibrate) if the file
        is unrecognized, was made for different weights, or disagrees with
        the current BISCUIT_INT8_MIDDLE setting."""
        from ..ops.int8_trunk import use_int8_middle
        from ..utils_log import log

        try:
            with open(path) as f:
                blob = json.load(f)
        except (OSError, ValueError, UnicodeDecodeError) as e:
            # Truncated/corrupt JSON (partial copy, disk-full artifact) or
            # a file that vanished/became unreadable after the exists()
            # check must trigger recalibration, not abort the constructor.
            log.warning("could not read int8 calibration at %s (%s); "
                        "recalibrating", path, e)
            return None
        if (not isinstance(blob, dict) or
                not isinstance(blob.get("scales"), dict)):
            log.warning("unrecognized int8 calibration format at %s; "
                        "recalibrating", path)
            return None
        if blob.get("weights_blake2b") != self._weights_digest():
            log.warning("int8 calibration at %s was made for different "
                        "weights; recalibrating", path)
            return None
        saved_middle = any(n.startswith("middle") for n in blob["scales"])
        if saved_middle != use_int8_middle():
            log.warning("int8 calibration at %s was made with "
                        "quant_middle=%s but BISCUIT_INT8_MIDDLE is %s; "
                        "recalibrating", path, saved_middle,
                        use_int8_middle())
            return None
        return blob["scales"]

    def save_calibration(self, path: str) -> None:
        """Write the frozen activation scales as JSON (atomic), tagged
        with the weights fingerprint, so another process can skip
        calibration via ``calibration_path=``."""
        if self._scales is None:
            raise ValueError("int8 calibration has not been frozen yet")
        blob = {
            "version": 1,
            "arch": self.model.arch,
            "weights_blake2b": self._weights_digest(),
            "scales": self._scales,
        }
        tmp = f"{path}.tmp.{os.getpid()}"
        try:
            with open(tmp, "w") as f:
                json.dump(blob, f, indent=1)
            os.replace(tmp, path)
        except BaseException:
            # Callers treat a failed save as non-fatal; don't leave a stale
            # .tmp.<pid> accumulating in the model dir when the write dies
            # partway (disk-full, quota).
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def __call__(self, tiles, key=None):
        """tiles: (B, H, W, 3) uint8/float RGB [0,255] -> (probs, uncertainty)."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        tiles = jnp.asarray(tiles)
        if tiles.ndim == 3:
            tiles = tiles[None]
        qw = self._int8_weights(tiles) if self._int8 else None
        if qw is not None:
            return self._infer(self.params, self.batch_stats, tiles, key, qw)
        return self._infer(self.params, self.batch_stats, tiles, key)
