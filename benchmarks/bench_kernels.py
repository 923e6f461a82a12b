"""Reproducible micro-benchmarks for the TPU compute path.

Run on the real chip:  python benchmarks/bench_kernels.py
Each section prints one line; see README.md for recorded numbers.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def bench_mcd_head():
    import jax

    from biscuit_tpu.models.xception import Head
    from biscuit_tpu.ops.mcd_head import mcd_head_pallas
    from biscuit_tpu.train.uq import mc_dropout_head

    B, F, H, K = 1024, 2048, 1024, 30
    rng = np.random.default_rng(0)
    feats = np.asarray(rng.standard_normal((B, F)), np.float32)
    head = Head(num_classes=2, hidden_layers=2, hidden_width=H)
    params = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats,
    )["params"]
    key = jax.random.PRNGKey(2)

    pallas_fn = jax.jit(
        lambda p, f, k: mcd_head_pallas(p, f, k, k=K, dropout=0.1)
    )
    t = timeit(pallas_fn, params, feats, key)
    flops = 2 * K * B * (F * H + H * H + H * 128)
    print(f"mcd_head_pallas  B={B} K={K}: {t*1e3:7.2f} ms "
          f"({flops/t/1e12:5.1f} TFLOPs)")

    class M:  # minimal shim for the lax path
        hidden_layers, hidden_width, dropout = 2, H, 0.1

        @staticmethod
        def apply(vars, f, **kw):
            return head.apply({"params": vars["params"]}, f, **{
                k: v for k, v in kw.items() if k != "method"})

    lax_fn = jax.jit(
        lambda p, f, k: mc_dropout_head(
            M, p, None, f, k, k=K, use_pallas=False
        )
    )
    try:
        t2 = timeit(lax_fn, {"params": params, "head": params}, feats, key)
        print(f"mcd_head_lax     B={B} K={K}: {t2*1e3:7.2f} ms")
    except Exception:
        pass


def bench_threshold_ops():
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.ops.roc_jax import apply_thresholds_jax, auc_jax

    n, n_slides = 2_000_000, 1000
    rng = np.random.default_rng(0)
    seg = rng.integers(0, n_slides, n)
    y = (seg % 2).astype(np.float32)
    p = rng.random(n).astype(np.float32)
    u = rng.random(n).astype(np.float32) * 0.5
    args = (jnp.asarray(y), jnp.asarray(p), jnp.asarray(u),
            jnp.asarray(seg), n_slides)
    fn = lambda *a: apply_thresholds_jax(  # noqa: E731
        *a, tile_uq=0.25, slide_uq=0.2, tile_pred=0.5, slide_pred=0.5
    )
    t = timeit(fn, *args)
    print(f"apply_thresholds_jax 2M tiles/1k slides: {t*1e3:7.2f} ms")
    t = timeit(jax.jit(auc_jax), jnp.asarray(y), jnp.asarray(p))
    print(f"auc_jax 2M:                              {t*1e3:7.2f} ms")


def bench_native_loader(tmp="/tmp/bench_tfr"):
    import io
    import os

    from PIL import Image

    from biscuit_tpu.data import native_loader as nl
    from biscuit_tpu.data.tfrecord import TFRecordWriter

    if not nl.available():
        print("native loader: not built")
        return
    os.makedirs(tmp, exist_ok=True)
    path = f"{tmp}/bench.tfrecords"
    n, px = 512, 299
    if not os.path.exists(path):
        rng = np.random.default_rng(0)
        with TFRecordWriter(path) as w:
            for i in range(n):
                img = rng.integers(0, 255, (px, px, 3), dtype=np.uint8)
                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                w.write_tile(f"s{i}", buf.getvalue(), loc_x=i, loc_y=0)
    offsets = nl.native_index_tfrecord(path)
    t0 = time.perf_counter()
    imgs, slides, locs, labels, ok = nl.native_read_decode_batch(
        path, offsets, px
    )
    t = time.perf_counter() - t0
    print(f"native batch decode {n}x{px}px PNG: {t*1e3:7.1f} ms "
          f"({n/t:6.0f} tiles/s, {ok} ok)")


def timeit_chained(make_step, x0, iters=8):
    """Serialized in-jit chain: each iteration's input depends on the
    previous output. Independent-dispatch timing through the axon tunnel
    under-reports (see CLAUDE.md); this is the honest variant."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(i, x):
            y = make_step(x)
            return x + jnp.mean(y).astype(x.dtype) * 1e-6
        return jax.lax.fori_loop(0, iters, body, x)

    y = chain(x0)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    y = chain(x0)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def bench_fused_preprocess():
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.data.normalize import (
        make_normalizer,
        per_image_standardization,
    )
    from biscuit_tpu.ops.fused_preprocess import fused_preprocess

    B = 256
    rng = np.random.default_rng(0)
    # f32 chain carrier: a uint8 carrier would round the epsilon feedback
    # to zero and let XLA elide the whole loop body.
    x = jnp.asarray(
        rng.integers(0, 255, (B, 299, 299, 3)).astype(np.float32))
    norm = make_normalizer("reinhard_fast")

    t_f = timeit_chained(
        lambda v: fused_preprocess(v.astype(jnp.uint8), norm), x)

    def xla_chain(v):
        return per_image_standardization(norm(v))

    t_x = timeit_chained(xla_chain, x)
    print(f"fused_preprocess B={B}: {t_f*1e3:7.2f} ms "
          f"(XLA chain {t_x*1e3:7.2f} ms, {t_x/t_f:4.1f}x)")


def bench_fused_middle():
    import jax
    import jax.numpy as jnp

    from biscuit_tpu.ops.fused_sepconv import fused_middle_flow

    B, C, U = 256, 728, 24
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 19, 19, C)), jnp.bfloat16)
    dw = jnp.asarray(rng.standard_normal((U, 9, C)) * 0.1, jnp.float32)
    pw = jnp.asarray(rng.standard_normal((U, C, C)) * 0.05, jnp.bfloat16)
    sc = jnp.ones((U, C), jnp.float32)
    sh = jnp.zeros((U, C), jnp.float32)
    t = timeit_chained(lambda v: fused_middle_flow(v, dw, pw, sc, sh), x)
    flops = 2 * B * 361 * C * U * (9 + C)
    print(f"fused_middle_flow B={B} U={U}: {t*1e3:7.2f} ms "
          f"({flops/t/1e12:5.1f} TFLOPs)")



if __name__ == "__main__":
    bench_native_loader()
    bench_threshold_ops()
    bench_mcd_head()
    bench_fused_preprocess()
    bench_fused_middle()
