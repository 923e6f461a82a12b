"""Nested-CV threshold search: host (pandas/numpy) vs device backend.

VERDICT r2 item 1 "Done" criterion: a measured nested-CV timing on a
>=2M-tile synthetic frame. Times three things per backend:

* ``detect`` — the full per-fold threshold derivation (two Youden
  searches over tiles + tile->slide reduction + slide-level tail),
* ``from_cv`` over 5 folds — the inner-loop unit of
  Experiment.thresholds_from_nested_cv (reference experiment.py:924-1026),

and for the device backend also reports the warm program time alone
(arrays pre-staged) vs end-to-end including host->device transfer, since
on the dev tunnel (~13 MB/s) transfer dominates while on a co-located
TPU VM it is PCIe-speed (see PARITY.md for the recorded numbers).

Run: python benchmarks/bench_threshold_device.py [n_tiles] [n_slides]
"""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_frame(n_tiles, n_slides, seed=0):
    """Realistic UQ frame: ~4% of slides are confidently wrong (flipped
    predictions, low uncertainty) so slide-level incorrect predictions
    survive the tile filter and all four threshold searches execute."""
    rng = np.random.default_rng(seed)
    slide_ids = rng.integers(0, n_slides, n_tiles)
    y = (slide_ids % 2).astype(np.float64)
    flipped = (slide_ids % 50) < 2
    target = np.where(flipped, 1.0 - y, y)
    yp = np.clip(target + rng.standard_normal(n_tiles) * 0.35, 0, 1)
    uq = np.clip(
        0.05 + np.where(flipped, 0.0, 0.4 * np.abs(yp - y))
        + rng.standard_normal(n_tiles) * 0.05, 1e-4, None)
    return pd.DataFrame({
        "slide": pd.Series(slide_ids).map(lambda s: f"slide{s}"),
        "patient": pd.Series(slide_ids).map(lambda s: f"pt{s}"),
        "y_true": y,
        "y_pred": yp,
        "uncertainty": uq,
    })


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_slides = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    import jax

    import biscuit_tpu.threshold as th

    print(f"backend={jax.default_backend()} n_tiles={n_tiles} "
          f"n_slides={n_slides}")
    df = make_frame(n_tiles, n_slides)

    # Host detect
    t0 = time.perf_counter()
    host = th.detect(df.copy(), backend="host")
    t_host = time.perf_counter() - t0
    print(f"host detect:            {t_host*1e3:9.1f} ms  "
          f"thresholds={ {k: (round(v, 6) if v is not None else None) for k, v in host[0].items()} }")

    # Device detect (cold: includes compile)
    t0 = time.perf_counter()
    dev = th.detect(df.copy(), backend="device")
    t_cold = time.perf_counter() - t0
    # Device detect (warm, end-to-end incl. host->device transfer)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = th.detect(df.copy(), backend="device")
        times.append(time.perf_counter() - t0)
    t_warm = min(times)
    print(f"device detect cold:     {t_cold*1e3:9.1f} ms")
    print(f"device detect warm e2e: {t_warm*1e3:9.1f} ms  "
          f"thresholds={ {k: (round(v, 6) if v is not None else None) for k, v in dev[0].items()} }")
    for k in ("tile_uq", "slide_uq", "tile_pred", "slide_pred"):
        h, d = host[0][k], dev[0][k]
        assert (h is None and d is None) or h == d or abs(h - d) <= 1e-6, \
            (k, h, d)
    assert abs(host[1] - dev[1]) <= 1e-6

    # Warm program time alone (arrays staged on device, scalars pulled).
    # Inputs VARY per iteration: the remote-dispatch layer caches
    # same-argument executions and reports absurdly fast times otherwise
    # (CLAUDE.md gotcha; the r2 "0.07 ms apply" figure was this artifact).
    from biscuit_tpu.ops import threshold_device as td

    yt, yp, u, seg, mask, keyed, levels, segs = td._prepare(df, "slide")
    tp_stage, tu_stage, g_stage = td._programs()
    yt, seg, mask, keyed = map(jax.device_put, (yt, seg, mask, keyed))
    variants = [
        (jax.device_put(yp * (1.0 + 1e-6 * i)),
         jax.device_put(u * (1.0 + 1e-6 * i)))
        for i in range(4)
    ]

    def program_only(ypv, uv):
        tp = td._resolve_youden(tp_stage(yt, ypv, mask))
        tu = td._resolve_youden(
            tu_stage(yt, ypv, uv, mask, np.float32(tp)))
        g = g_stage(yt, ypv, uv, seg, keyed, np.float32(tu),
                    num_segments=segs, tu_on=True)
        return {k: np.asarray(v) for k, v in g.items()}

    program_only(*variants[0])
    times = []
    for ypv, uv in variants[1:]:
        t0 = time.perf_counter()
        program_only(ypv, uv)
        times.append(time.perf_counter() - t0)
    t_prog = min(times)
    print(f"device programs (staged): {t_prog*1e3:7.1f} ms  "
          f"(speedup vs host: {t_host/t_prog:.1f}x program, "
          f"{t_host/t_warm:.1f}x end-to-end)")

    # from_cv over 5 folds (the nested-CV inner unit)
    folds = [make_frame(n_tiles // 5, n_slides, seed=s) for s in range(5)]
    t0 = time.perf_counter()
    th.from_cv([f.copy() for f in folds], backend="host")
    t_cv_host = time.perf_counter() - t0
    th.from_cv([f.copy() for f in folds], backend="device")  # warm compile
    t0 = time.perf_counter()
    th.from_cv([f.copy() for f in folds], backend="device")
    t_cv_dev = time.perf_counter() - t0
    print(f"from_cv 5x{n_tiles//5}: host {t_cv_host*1e3:8.1f} ms   "
          f"device {t_cv_dev*1e3:8.1f} ms   "
          f"({t_cv_host/t_cv_dev:.1f}x)")


if __name__ == "__main__":
    main()
