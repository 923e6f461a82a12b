"""w8a8 (int8 weights + int8 activations) Xception trunk for inference.

STATUS: built + CPU-parity-tested; on-chip probe MEASURED (v5e via axon,
2026-08-19, benchmarks/bench_int8_probe.py — per-layer chains, fresh
args per dispatch, all outputs fenced, fence cost subtracted):

    geometry                         bf16 ms   int8 ms   int8 speedup
    middle_pw 19x19 728->728           1.006     0.462       2.18x
    exit_pw   10x10 1536->2048         1.067     0.719       1.48x
    entry_pw  75x75 128->128           1.223     0.338       3.62x
    stem conv2 147x147 32->64 k3       2.350     1.627       1.44x
    big dot 8192^3 (peak probe)        6.281     3.145       2.00x
    entry0 sep 147x147 64->128 MIXED   3.765     3.666       1.03x
    entry1 sep 74x74 128->256 MIXED    2.269     2.274       1.00x

XLA does emit native int8 MXU convs: the peak probe hits 350 TOP/s (89%
of the 394 TOP/s spec) at exactly 2x bf16, and every isolated pointwise
conv wins 1.44-3.62x. The MIXED rows are the honest entry-flow picture:
with the bf16 depthwise in the same program, the dw's VPU-issue floor
dominates and quantizing the following pw is a wash.

END-TO-END VERDICT (K=30 UQ headline, B=1024, bench.py, same chip/day):

    trunk                              tiles/s     MFU
    bf16 (fused Pallas middle)         4151.1     35.6%   <- headline
    w8a8 stem/entry/exit               4150.7     35.6%
    w8a8 + int8 middle (XLA convs)     3825.7     32.8%

ACQUITTAL — the trunk's default stays bf16, for measured reasons:
(1) w8a8 on stem/entry/exit is EXACTLY neutral: the entry flow is the
MIXED wash above, and the stem/exit wins (1.44-1.48x on probe) apply to
slices too small to move a 245 ms budget dominated by depthwise VPU time
(~147 ms) + the fused middle. (2) Extending int8 to the middle LOSES
7.8%: the isolated middle_pw probe wins 2.18x, but the real competitor
is the fused bf16 Pallas kernel whose dw->pw handoff never leaves VMEM —
the unfused int8 path pays that HBM round trip plus quantize VPU work,
and the fusion margin beats int8's 2x MXU rate. A fused-int8 middle
kernel cannot recover it (quantize cost on the issue-bound VPU —
analysis below). This closes the last open lever on the 35.6% MFU
headline: the remaining gap to peak is the depthwise VPU-issue floor
(ops/fused_sepconv.py tuning record). Do not re-attempt without new
evidence (e.g. a Mosaic packed-bf16 VPU path or an int8 depthwise
story). The w8a8 path stays maintained as an opt-in for weight-memory-
constrained serving (4x smaller trunk weights than f32, 2x vs bf16).

Enable with BISCUIT_INT8_TRUNK=1 or
``UncertaintyInterface(..., int8_trunk=True)`` (which calibrates on the
first >=256 tiles while answering through the exact f32 path, then
switches); lower-level callers build weights once via
``calibrate_int8_trunk`` + ``prepare_int8_trunk`` and pass them as
``mc_dropout_predict(..., int8_qw=qw)``.

Motivation (v5e): the MXU runs int8 x int8 -> int32 at 394 TOP/s vs 197
bf16 TFLOP/s, and int8 activations halve HBM bytes — relevant because the
entry flow's activations are huge (147x147x128 at B=1024 is 5.5 GB per
tensor in bf16) and the trunk's non-depthwise budget (~98 ms of 245 at
B=1024) is MXU/HBM-bound. The depthwise convs are VPU-issue-bound
(dtype-independent — ops/fused_sepconv.py tuning record), so they stay
bf16; quantization wraps only the MXU convs:

    ... -> relu(bf16) -> dw3x3(bf16) -> quantize -> pw1x1(int8->int32)
        -> dequant(* s_in*s_w[c]*bn_scale[c] + bn_shift[c]) -> bf16 -> ...

Scheme: post-training quantization, symmetric. Weights per-output-channel
(absmax/127, BN folded into the dequant scale); activations per-tensor
with scales calibrated from f32 forwards (running absmax at each quant
site). By default the middle flow keeps the fused bf16 Pallas kernel (its
activations never leave VMEM, so int8's HBM win doesn't apply there);
BISCUIT_INT8_MIDDLE=1 / quant_middle=True extends w8a8 to the middle
pointwise convs too via XLA convs, a bet that int8's halved HBM bytes +
doubled MXU beat the fused kernel's fusion margin — measured on chip.

Why there is deliberately NO fused-int8 middle kernel (analysis, v5e,
B=256 middle geometry): the fused bf16 kernel's 24.3 ms splits ~12 ms
VPU taps + ~12 ms MXU pw (both near their issue/peak rates — tuning
record in ops/fused_sepconv.py). int8 would halve the MXU half (-6 ms)
but the per-unit quantize it requires (round+clip+cast over 19*19*256*728
= 67M elements, x24 units, ~1 VPU pass each) costs ~4.8 ms back on the
already-issue-bound VPU: net <5% for a Mosaic-int8-matmul risk. int8
pays only where activations cross HBM between dw and pw — exactly the
unfused XLA path that quant_middle uses.

Science guard: quantization perturbs features, so this path is *inference
opt-in only* and tests/test_int8_trunk.py pins (a) feature cosine
similarity vs the f32 trunk and (b) end-to-end UQ AUC parity on a
trained synthetic-corpus model. The reference has no quantized path
(slideflow/TF runs fp32); this is a deliberate TPU-native addition, not
a parity item.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_CDTYPE = jnp.bfloat16  # dtype of the non-quantized (depthwise/pool) ops


def use_int8_trunk() -> bool:
    return os.environ.get("BISCUIT_INT8_TRUNK") == "1"


def use_int8_middle() -> bool:
    """Extend w8a8 quantization to the middle-flow pointwise convs
    (BISCUIT_INT8_MIDDLE=1). Separate knob from the stem/entry/exit
    quantization: the bf16 middle flow runs through the fused Pallas
    kernel whose activations never leave VMEM, so int8 must beat it on
    MXU rate alone (2x peak) rather than HBM bytes — a different bet,
    measured separately by the on-chip probe/bench."""
    return os.environ.get("BISCUIT_INT8_MIDDLE") == "1"


# ---------------------------------------------------------------------------
# Weight folding: Flax param tree -> flat per-conv dict with BN folded.
# ---------------------------------------------------------------------------


def _fold_trunk(params, batch_stats, arch_cfg,
                include_middle: bool = False) -> Dict[str, Any]:
    """Flatten stem+entry+exit weights with each conv's following BN folded
    to (scale, shift). Depthwise kernels pass through unquantized (their
    BN sits after the pointwise, Keras SeparableConv2D semantics).

    Runs entirely on HOST numpy over ONE device_get of the trunk weights:
    params are usually device-resident, and eager per-conv device math here
    would be dozens of tiny remote compiles over a tunneled TPU (CLAUDE.md
    host-init rule). The fold formula mirrors fused_sepconv.fold_bn
    (flax BatchNorm, eps=1e-5; the Keras-eps-1e-3 compensation is already
    baked into batch_stats by models/pretrained.py)."""
    host = jax.device_get({"p": params["backbone"],
                           "s": batch_stats["backbone"]})
    bp, bs = host["p"], host["s"]
    fw: Dict[str, Any] = {}

    def conv_bn(name, kernel, bn_p, bn_s):
        scale = np.asarray(bn_p["scale"], np.float32) / np.sqrt(
            np.asarray(bn_s["var"], np.float32) + 1e-5)
        shift = (np.asarray(bn_p["bias"], np.float32)
                 - np.asarray(bn_s["mean"], np.float32) * scale)
        fw[name] = {
            "k": np.asarray(kernel, np.float32),
            "bn_scale": scale,
            "bn_shift": shift,
        }

    conv_bn("conv1", bp["conv1"]["kernel"], bp["conv1_bn"], bs["conv1_bn"])
    conv_bn("conv2", bp["conv2"]["kernel"], bp["conv2_bn"], bs["conv2_bn"])

    def fold_sep(prefix, blk_p, blk_s, j):
        fw[f"{prefix}.dw{j}"] = np.asarray(
            blk_p[f"sep{j}"]["depthwise"]["kernel"]).astype(_CDTYPE)
        conv_bn(f"{prefix}.pw{j}",
                blk_p[f"sep{j}"]["pointwise"]["kernel"],
                blk_p[f"bn{j}"], blk_s[f"bn{j}"])

    def block(prefix, blk_p, blk_s, n_seps):
        conv_bn(f"{prefix}.res", blk_p["res_conv"]["kernel"],
                blk_p["res_bn"], blk_s["res_bn"])
        for j in range(n_seps):
            fold_sep(prefix, blk_p, blk_s, j)

    for i in range(len(arch_cfg["entry_blocks"])):
        block(f"entry{i}", bp[f"entry{i}"], bs[f"entry{i}"], 2)
    if include_middle:
        # Middle blocks: identity residual (strides=1, same width), three
        # relu->dw->pw->BN sepconvs each (models/xception.py XceptionBlock).
        # _middle_quant hard-codes that identity residual, which only holds
        # when the middle width equals the last entry-block width — fail
        # fast if a future ARCHS entry breaks the assumption.
        assert arch_cfg["middle_width"] == arch_cfg["entry_blocks"][-1], (
            "quantized middle flow assumes an identity residual "
            "(middle_width == last entry width)")
        for i in range(arch_cfg["middle_repeats"]):
            for j in range(3):
                fold_sep(f"middle{i}", bp[f"middle{i}"], bs[f"middle{i}"], j)
    block("exit_block", bp["exit_block"], bs["exit_block"], 2)
    for i in range(len(arch_cfg["exit_convs"])):
        fw[f"exit_sep{i}.dw"] = np.asarray(
            bp[f"exit_sep{i}"]["depthwise"]["kernel"]).astype(_CDTYPE)
        conv_bn(f"exit_sep{i}.pw",
                bp[f"exit_sep{i}"]["pointwise"]["kernel"],
                bp[f"exit_bn{i}"], bs[f"exit_bn{i}"])
    return fw


# ---------------------------------------------------------------------------
# The shared forward. mode='calibrate' runs f32 and returns per-site absmax;
# mode='int8' quantizes each MXU conv's input with the calibrated scale.
# ---------------------------------------------------------------------------


def _mxu_conv(h, site, fw, qw, sites, *, strides=(1, 1), padding="SAME"):
    """One quantization-wrapped MXU conv (+ folded BN). In calibrate mode
    records absmax(h) and computes in f32; in int8 mode quantizes."""
    if qw is None:
        sites[site] = jnp.max(jnp.abs(h)).astype(jnp.float32)
        w = fw[site]
        y = jax.lax.conv_general_dilated(
            h.astype(jnp.float32), w["k"], strides, padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y * w["bn_scale"] + w["bn_shift"]
    w = qw[site]
    q = jnp.clip(jnp.round(h.astype(jnp.float32) * w["inv_s_in"]),
                 -127.0, 127.0).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        q, w["k"], strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * w["eff"] + w["shift"]


def _dw_conv(h, kernel):
    cin = h.shape[-1]
    return jax.lax.conv_general_dilated(
        h.astype(_CDTYPE), kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=cin,
        preferred_element_type=jnp.float32,
    )


def _maxpool(h):
    return jax.lax.reduce_window(
        h, jnp.asarray(-jnp.inf, h.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), "SAME",
    )


def _act(y):
    """Post-dequant cast back to the compute dtype."""
    return y.astype(_CDTYPE)


def _block(h, prefix, fw, qw, sites, *, relu_first):
    """XceptionBlock(features=(f, f), strides=2) — models/xception.py:81."""
    residual = _act(_mxu_conv(h, f"{prefix}.res", fw, qw, sites,
                              strides=(2, 2)))
    g = h
    for j in range(2):
        if j > 0 or relu_first:
            g = jax.nn.relu(g)
        g = _dw_conv(g, _dwk(fw, qw, f"{prefix}.dw{j}"))
        g = _act(_mxu_conv(g, f"{prefix}.pw{j}", fw, qw, sites))
    g = _maxpool(g)
    return g + residual


def _dwk(fw, qw, name):
    return (qw if qw is not None else fw)[name]


def _middle_quant(h, fw, qw, sites, n_blocks):
    """w8a8 middle flow: identity-residual blocks of relu -> bf16 dw ->
    int8 pw (+ folded BN), mirroring XceptionBlock(strides=1,
    relu_first=True) — models/xception.py:88-114."""
    for i in range(n_blocks):
        g = h
        for j in range(3):
            g = jax.nn.relu(g)
            g = _dw_conv(g, _dwk(fw, qw, f"middle{i}.dw{j}"))
            g = _act(_mxu_conv(g, f"middle{i}.pw{j}", fw, qw, sites))
        h = g + h
    return h


def _forward(x, fw, qw, arch_cfg, middle_fn, quant_middle: bool = False):
    """stem + entry (+ middle via middle_fn, or quantized in-module when
    quant_middle) + exit -> pooled f32 feats. Mirrors
    XceptionBackbone.__call__ (models/xception.py:117-187) with
    inference BN folded. Returns (feats, sites)."""
    sites: Dict[str, jnp.ndarray] = {}
    h = _act(_mxu_conv(x.astype(jnp.float32), "conv1", fw, qw, sites,
                       strides=(2, 2), padding="VALID"))
    h = jax.nn.relu(h)
    h = _act(_mxu_conv(h, "conv2", fw, qw, sites, padding="VALID"))
    h = jax.nn.relu(h)
    for i in range(len(arch_cfg["entry_blocks"])):
        h = _block(h, f"entry{i}", fw, qw, sites, relu_first=(i != 0))

    if quant_middle:
        h = _middle_quant(h, fw, qw, sites, arch_cfg["middle_repeats"])
    else:
        h = middle_fn(h)

    h = _block(h, "exit_block", fw, qw, sites, relu_first=True)
    for i in range(len(arch_cfg["exit_convs"])):
        g = _dw_conv(h, _dwk(fw, qw, f"exit_sep{i}.dw"))
        h = _act(_mxu_conv(g, f"exit_sep{i}.pw", fw, qw, sites))
        h = jax.nn.relu(h)
    return jnp.mean(h, axis=(1, 2)).astype(jnp.float32), sites


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _middle_fn(model, params, batch_stats, interpret=False,
               fused: Optional[bool] = None) -> Callable:
    """Middle flow exactly as the production bf16 path runs it (fused
    Pallas on TPU, XLA elsewhere) — quantization does not touch it.
    ``fused`` mirrors mc_dropout_predict's fused_trunk override; None
    defers to the env/backend gate."""
    from ..models.xception import ARCHS
    from .fused_sepconv import (
        fused_middle_flow,
        stack_middle_weights,
        use_fused_middle,
    )

    if fused is None:
        fused = use_fused_middle() or interpret
    if fused:
        wts = stack_middle_weights(
            params["backbone"], batch_stats["backbone"],
            ARCHS[model.arch]["middle_repeats"])
        return lambda h: fused_middle_flow(h, *wts, interpret=interpret)
    v = {"params": params, "batch_stats": batch_stats}
    return lambda h: model.apply(v, h.astype(_CDTYPE), train=False,
                                 method="trunk_middle")


class Int8Calibrator:
    """Accumulating activation-range calibration.

    Runs f32 forwards over representative preprocessed batches and keeps
    the per-site running absmax, so the calibration range can be built
    from MANY batches (UncertaintyInterface feeds it the first >=256
    tiles) instead of whatever single batch happens to arrive first. The
    jitted forward takes the folded weights as an ARGUMENT (one device_put
    at construction) rather than closing over them, so nothing multi-MB is
    baked into the traced program (tunnel rule, CLAUDE.md)."""

    def __init__(self, model, params, batch_stats, interpret: bool = False,
                 fused_trunk: Optional[bool] = None,
                 quant_middle: Optional[bool] = None):
        from ..models.xception import ARCHS

        if quant_middle is None:
            quant_middle = use_int8_middle()
        cfg = ARCHS[model.arch]
        self._fw = jax.device_put(
            _fold_trunk(params, batch_stats, cfg,
                        include_middle=quant_middle))
        self._params, self._batch_stats = params, batch_stats

        def _sites(fw, p, bs, x):
            mid = (None if quant_middle
                   else _middle_fn(model, p, bs, interpret, fused_trunk))
            return _forward(x, fw, None, cfg, mid,
                            quant_middle=quant_middle)[1]

        self._sites_fn = jax.jit(_sites)
        self._absmax: Dict[str, float] = {}
        self.n_tiles = 0

    def update(self, x) -> None:
        """Fold one preprocessed f32 batch into the running per-site absmax."""
        sites = jax.device_get(
            self._sites_fn(self._fw, self._params, self._batch_stats, x))
        for k, v in sites.items():
            self._absmax[k] = max(float(v), self._absmax.get(k, 0.0))
        self.n_tiles += int(x.shape[0])

    def scales(self) -> Dict[str, float]:
        """{site: activation_scale} (absmax/127, floored so a dead site
        cannot divide by zero)."""
        if not self._absmax:
            raise ValueError("Int8Calibrator.scales() before any update()")
        return {k: max(v / 127.0, 1e-8) for k, v in self._absmax.items()}


def calibrate_int8_trunk(model, params, batch_stats, x_sample,
                         interpret: bool = False,
                         fused_trunk: Optional[bool] = None,
                         quant_middle: Optional[bool] = None,
                         ) -> Dict[str, float]:
    """One-shot calibration over a single representative batch (see
    Int8Calibrator for the accumulating variant)."""
    cal = Int8Calibrator(model, params, batch_stats, interpret, fused_trunk,
                         quant_middle)
    cal.update(x_sample)
    return cal.scales()


def prepare_int8_trunk(model, params, batch_stats,
                       scales: Dict[str, float]) -> Dict[str, Any]:
    """Quantize weights (per-output-channel symmetric) and pre-combine the
    dequant factors: eff[c] = s_in * s_w[c] * bn_scale[c]. Pure host numpy
    (see _fold_trunk); callers device_put the result or pass it as a jit
    argument."""
    from ..models.xception import ARCHS

    cfg = ARCHS[model.arch]
    # The calibration sites are the single source of truth for which convs
    # are quantized — middle-flow entries appear iff the calibrator ran
    # with quant_middle.
    quant_middle = any(n.startswith("middle") for n in scales)
    fw = _fold_trunk(params, batch_stats, cfg, include_middle=quant_middle)
    qw: Dict[str, Any] = {}
    for name, w in fw.items():
        if not isinstance(w, dict):  # depthwise kernel: pass through bf16
            qw[name] = w
            continue
        s_in = scales[name]
        k = w["k"]
        s_w = np.maximum(
            np.max(np.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
        qk = np.clip(np.round(k / s_w), -127.0, 127.0).astype(np.int8)
        qw[name] = {
            "k": qk,
            "inv_s_in": np.float32(1.0 / s_in),
            "eff": (s_in * s_w * w["bn_scale"]).astype(np.float32),
            "shift": w["bn_shift"].astype(np.float32),
        }
    return qw


def trunk_features_int8(model, params, batch_stats, x, qw,
                        interpret: bool = False,
                        fused_trunk: Optional[bool] = None):
    """Pooled trunk features via the w8a8 stem/entry/exit + bf16 middle.
    Drop-in for ``model.apply(..., method='features')`` at inference;
    ``x`` is the preprocessed (normalized+standardized) f32 batch.
    ``fused_trunk`` overrides the middle-flow backend gate (passed through
    from mc_dropout_predict). If ``qw`` carries middle-flow entries (it
    was calibrated with quant_middle), the middle runs w8a8 in-module
    instead of the bf16 backend."""
    from ..models.xception import ARCHS

    cfg = ARCHS[model.arch]
    quant_middle = any(n.startswith("middle") for n in qw)
    mid = (None if quant_middle
           else _middle_fn(model, params, batch_stats, interpret,
                           fused_trunk))
    feats, _ = _forward(x, None, qw, cfg, mid, quant_middle=quant_middle)
    return feats
