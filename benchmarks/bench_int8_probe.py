"""Probe: does int8 (s8 x s8 -> s32) run ~2x bf16 on the v5e MXU, at the
geometries this model actually has?

Motivation: the trunk inference budget at B=1024 splits ~147 ms depthwise
(VPU-issue floor, closed — ops/fused_sepconv.py tuning record) + ~98 ms
everything else, which is dominated by MXU ops (pointwise convs, stem,
residual 1x1s, exit sepconv pointwise, head). v5e peak is 197 bf16 TFLOP/s
vs 394 int8 TOP/s, so a w8a8 quantized inference path could halve the MXU
share *if* XLA actually emits native int8 MXU convolutions rather than
upcasting. This probe measures that, per geometry, before committing the
headline to the quantized trunk (ops/int8_trunk.py).

Methodology — two timing traps, both hit and fixed here:

1. Same-args-repeated dispatch (CLAUDE.md gotcha): never time the exact
   call that warmed the program — and never REPEAT an (args) combination
   inside the timed window either. An earlier revision warmed every buffer
   and then cycled the same buffers through the timed loop; the tunnel
   runtime memoized the repeated (program, args) dispatches and reported
   29-364 PFLOP/s (vs 197 TFLOP/s bf16 peak — measured artifact, r3).
   Now buffer 0 is used only for compile+warm and each timed dispatch
   gets a never-before-seen input buffer; we dispatch all ITERS
   asynchronously and block once on the full output list.

2. Slice-DCE through convolution: a chain whose only live output is a
   *sliced* scalar (e.g. ``sum(y[0,0,0,:3])``) lets XLA propagate the
   slice backwards — for a 1x1 conv, output pixel (0,0,0) depends only on
   input pixel (0,0,0), so a 20-layer "data-dependent" chain collapses to
   twenty 728x728 dots and reports 3-12 PFLOP/s (measured artifact, r3).
   Every chained layer here returns its FULL-size array, like a real
   network layer; nothing downstream slices it.

Each measurement jits a DEPTH-layer chain (conv -> requantize back to the
input dtype/shape, the cost a real quantized layer pays between MXU ops)
and times ITERS dispatches, each over a never-before-seen input buffer
(N_BUFS = ITERS+1 buffers: xs[0] compiles/warms, xs[1:] are timed once
each). The timed window is closed by fetching ONE scalar that reduces
EVERY output — not just the last — so a runtime that only materializes
demanded values (the tunnel has memoized/elided work before; see _fence)
cannot skip any timed dispatch. The fence program's own cost (reduction
+ tunnel round-trip) is measured once on already-materialized buffers
and subtracted. Inputs are generated ON DEVICE (one PRNG program) —
shipping hundreds of MB through the dev tunnel takes minutes.

Run (one geometry per process — remote compiles are minutes and a hung
compile should kill only one measurement):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_int8_probe.py [geom_idx]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from biscuit_tpu.ops.threshold_device import _enable_persistent_compile_cache

_enable_persistent_compile_cache()

ITERS = 8
N_BUFS = ITERS + 1  # xs[0] warms the program; xs[1:] are timed, each once
DEPTH = 6  # layers chained inside one jit program

# (name, B, H, W, Cin, Cout, kernel) — the model's MXU-heavy convs, at
# batch sizes keeping each input buffer under ~200 MB (ITERS=8 full-size
# outputs stay live during the pipelined timing loop, plus N_BUFS=9
# inputs).
# kernel: 1/3 = conv k x k; 0 = plain dot (Cin x Cin @ Cin x Cout);
# -1 = MIXED (bf16 depthwise 3x3 -> pointwise in the probed dtype, the
# pattern a w8a8 entry flow actually runs).
GEOMS = [
    ("middle_pw 19x19 728->728", 256, 19, 19, 728, 728, 1),
    ("exit_pw   10x10 1536->2048", 256, 10, 10, 1536, 2048, 1),
    ("entry_pw  75x75 128->128", 128, 75, 75, 128, 128, 1),
    ("stem conv2 147x147 32->64 k3", 128, 147, 147, 32, 64, 3),
    ("big dot 8192^3 (peak probe)", 0, 0, 0, 8192, 8192, 0),
    ("entry0 sep 147x147 64->128 MIXED", 64, 147, 147, 64, 128, -1),
    ("entry1 sep 74x74 128->256 MIXED", 128, 74, 74, 128, 256, -1),
]


def _conv(x, w, *, groups=1, acc):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=acc,
    )


def _back_to_cin(y, cin):
    """Full-rank shape restore: slice (cout>=cin) or tile (cout<cin).
    Keeps every output element live — no slice-DCE window."""
    cout = y.shape[-1]
    if cout >= cin:
        return y[..., :cin]
    return jnp.tile(y, (1,) * (y.ndim - 1) + (cin // cout,))


def _layer_conv(x, w, *, dtype):
    """One conv layer + the requantize a real quantized net pays, returning
    a full-size array of the input's shape/dtype."""
    cin = x.shape[-1]
    if dtype == jnp.int8:
        y = _conv(x, w, acc=jnp.int32)
        yf = y.astype(jnp.float32) * jnp.float32(1e-3)
        nxt = jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
    else:
        y = _conv(x, w, acc=jnp.float32)
        nxt = (y * 0.01).astype(x.dtype)
    return _back_to_cin(nxt, cin)


def _layer_dot(x, w, *, dtype):
    if dtype == jnp.int8:
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32) * jnp.float32(1e-4)
        return jnp.clip(jnp.round(yf), -127, 127).astype(jnp.int8)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return (y * 0.01).astype(x.dtype)


def _layer_mixed(x, wd, wp, *, int8_pw):
    """dw3x3(bf16, VPU) -> [quantize -> int8 pw -> dequant | bf16 pw],
    the exact per-unit pattern of a w8a8 entry flow (int8_trunk.py)."""
    cin = x.shape[-1]
    h = _conv(x, wd, groups=cin, acc=jnp.float32).astype(jnp.bfloat16)
    if int8_pw:
        q = jnp.clip(jnp.round(h.astype(jnp.float32) * 16.0),
                     -127, 127).astype(jnp.int8)
        y = _conv(q, wp, acc=jnp.int32)
        nxt = (y.astype(jnp.float32) * (1.0 / 16.0) * 0.01)
        nxt = nxt.astype(jnp.bfloat16)
    else:
        nxt = (_conv(h, wp, acc=jnp.float32) * 0.01).astype(jnp.bfloat16)
    return _back_to_cin(nxt, cin)


def _chain(x, *ws, layer, depth):
    return jax.lax.fori_loop(
        0, depth, lambda i, h: layer(h, *ws), x)


def _dev_inputs(shape, dtype, n):
    """n distinct device-resident buffers from one on-device PRNG program."""
    if dtype == jnp.int8:
        make = jax.jit(lambda k: jax.random.randint(
            k, (n,) + shape, -4, 4, jnp.int32).astype(jnp.int8))
    else:
        make = jax.jit(lambda k: (jax.random.normal(
            k, (n,) + shape, jnp.float32) * 0.1).astype(dtype))
    stacked = make(jax.random.PRNGKey(7))
    jax.block_until_ready(stacked)
    return [stacked[i] for i in range(n)]


@jax.jit
def _fence_reduce(ys):
    """One scalar that depends on EVERY element of EVERY output. In-order
    execution would make fencing only the last output sufficient on a
    standard PJRT stream — but this tunnel runtime has been caught
    memoizing repeated dispatches and returning from block_until_ready
    early (measured artifacts, r3: 253 PFLOP/s "bf16"), so assume it may
    also defer/elide work whose value is never demanded. Reducing all
    outputs into the single fetched scalar removes that failure mode;
    full reductions also leave no slice-DCE window."""
    return functools.reduce(
        jnp.add, [jnp.sum(y.astype(jnp.float32)) for y in ys])


def _fence(ys):
    """Drain the device pipeline for real: fetch (as 4 host bytes) a value
    that depends on every timed output. See _fence_reduce."""
    return float(_fence_reduce(list(ys)))


def _timeit(fn, xs, ws):
    n = len(xs) - 1
    warm = fn(xs[0], *ws)  # compile + warm (xs[0] never reappears)
    _fence([warm] * n)     # compile the n-ary fence program
    # Fence overhead: the same fence program over already-materialized,
    # never-fenced buffers (xs[1:] share the chain's output shape/dtype by
    # construction — _back_to_cin restores it). Distinct args, so the
    # tunnel's dispatch memoization can't shortcut it. Subtracted from the
    # timed window below so the reduction + round-trip doesn't bias
    # per-layer time upward (it is amortized over only n*DEPTH layers).
    t0 = time.perf_counter()
    _fence(list(xs[1:]))
    fence_overhead = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = [fn(x, *ws) for x in xs[1:]]  # each dispatch: fresh args
    _fence(outs)
    dt = time.perf_counter() - t0 - fence_overhead
    return max(dt, 1e-9) / (n * DEPTH)  # seconds per layer


def measure(name, b, H, W, cin, cout, k):
    rows = []
    if k == -1:  # mixed dw-bf16 / pw-{bf16,int8}
        xs = _dev_inputs((b, H, W, cin), jnp.bfloat16, N_BUFS)
        wd = _dev_inputs((3, 3, 1, cin), jnp.bfloat16, 1)[0]
        flops = 2.0 * b * H * W * cin * (9 + cout)  # dw taps + pw
        for int8_pw, label in ((False, "bf16"), (True, "int8")):
            wp = _dev_inputs((1, 1, cin, cout),
                             jnp.int8 if int8_pw else jnp.bfloat16, 1)[0]
            fn = jax.jit(functools.partial(
                _chain, layer=functools.partial(_layer_mixed,
                                                int8_pw=int8_pw),
                depth=DEPTH))
            t = _timeit(fn, xs, (wd, wp))
            rows.append((label, t))
            print(f"  {name:34s} {label}: {t*1e3:8.3f} ms/layer  "
                  f"{flops/t/1e12:7.1f} T{'OP' if int8_pw else 'FLOP'}/s",
                  flush=True)
    else:
        for dtype, label in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
            if k == 0:
                xs = _dev_inputs((cin, cin), dtype, N_BUFS)
                w = _dev_inputs((cin, cout), dtype, 1)[0]
                layer = functools.partial(_layer_dot, dtype=dtype)
                flops = 2.0 * cin * cin * cout
            else:
                xs = _dev_inputs((b, H, W, cin), dtype, N_BUFS)
                w = _dev_inputs((k, k, cin, cout), dtype, 1)[0]
                layer = functools.partial(_layer_conv, dtype=dtype)
                flops = 2.0 * b * H * W * cin * cout * k * k
            fn = jax.jit(functools.partial(_chain, layer=layer, depth=DEPTH))
            t = _timeit(fn, xs, (w,))
            rows.append((label, t))
            print(f"  {name:34s} {label}: {t*1e3:8.3f} ms/layer  "
                  f"{flops/t/1e12:7.1f} T{'OP' if dtype == jnp.int8 else 'FLOP'}/s",
                  flush=True)
    print(f"  {name:34s} int8 speedup: {rows[0][1] / rows[1][1]:.2f}x",
          flush=True)


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if len(sys.argv) > 1:
        measure(*GEOMS[int(sys.argv[1])])
        return
    for g in GEOMS:
        measure(*g)


if __name__ == "__main__":
    main()
