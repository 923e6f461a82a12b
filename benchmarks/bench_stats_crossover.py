"""Host-vs-device detect() crossover: where should auto-dispatch flip?

VERDICT r3 weak-4: the 500k-row default for
``BISCUIT_DEVICE_STATS_MIN_ROWS`` was a guess, and the published
nested-CV fold shape (~400k tiles/fold at the 'AA' rung: 941 slides x
~1000 tiles, 5 inner folds) sits right at that boundary. This measures
the break-even from data: chain-timed host vs device ``detect`` at
50k/100k/250k/500k/1M/2M rows.

Methodology: every timed call gets a FRESH frame (different seed —
same-args-repeated dispatches hit the tunnel's memoization and report
absurd times, CLAUDE.md gotcha); per size the device path is compiled
once on a throwaway frame first (the row bucket is the power-of-two pad
in ops/threshold_device.py, so each size class compiles once and the
published nested-CV reuses warm programs across folds). Reported device
time is warm END-TO-END (host frame -> pandas prep -> transfer ->
programs -> scalars back): that is what ``detect`` costs its caller.
min-of-3 per backend per size (1-core box, CPU-steal spikes).

The measured curve (v5e over the axon tunnel, 2026-08-19, recorded in
threshold.py and PARITY.md) sets the shipped MIN_ROWS default. On a
co-located TPU VM transfer is PCIe-speed, so the true crossover is
lower; the tunnel number is the conservative bound.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bench_stats_crossover.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_threshold_device import make_frame  # noqa: E402

SIZES = [50_000, 100_000, 250_000, 500_000, 1_000_000, 2_000_000]
REPS = 3
N_SLIDES_PER_TILE = 1 / 1000  # ~published shape: ~1000 tiles per slide


def main():
    import jax

    import biscuit_tpu.threshold as th

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    rows = []
    seed = 100
    for n in SIZES:
        n_slides = max(int(n * N_SLIDES_PER_TILE), 50)
        # Warm the device programs for this row bucket on a throwaway
        # frame (compile excluded from timing; nested-CV folds share
        # buckets, so warm is the steady state).
        th.detect(make_frame(n, n_slides, seed=seed), backend="device")
        seed += 1
        t_host, t_dev = [], []
        for _ in range(REPS):
            df = make_frame(n, n_slides, seed=seed)
            seed += 1
            t0 = time.perf_counter()
            h = th.detect(df.copy(), backend="host")
            t_host.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            d = th.detect(df.copy(), backend="device")
            t_dev.append(time.perf_counter() - t0)
            for k in ("tile_uq", "slide_uq", "tile_pred", "slide_pred"):
                hv, dv = h[0][k], d[0][k]
                if hv is None or dv is None:
                    # Both-None is the degenerate-fold agreement case; a
                    # one-sided None is a parity failure — report it
                    # rather than TypeError on None arithmetic.
                    assert hv is None and dv is None, (n, k, hv, dv)
                else:
                    assert hv == dv or abs(hv - dv) <= 1e-6, (n, k, hv, dv)
        th_ms, td_ms = min(t_host) * 1e3, min(t_dev) * 1e3
        rows.append((n, th_ms, td_ms))
        print(f"n={n:>9,}  host {th_ms:9.1f} ms   device(warm e2e) "
              f"{td_ms:9.1f} ms   ratio {th_ms/td_ms:5.2f}x", flush=True)

    # Break-even: first size where device wins and stays winning.
    crossover = None
    for i, (n, h, d) in enumerate(rows):
        if d < h and all(dd < hh for _, hh, dd in rows[i:]):
            crossover = n
            break
    print(f"\ncrossover (device wins from): "
          f"{crossover if crossover else 'beyond tested range'}")


if __name__ == "__main__":
    main()
