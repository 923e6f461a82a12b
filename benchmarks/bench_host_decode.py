"""Host tile-decode throughput: thread scaling + co-located projection.

VERDICT r2 item 2: the chip runs at ~4.1k tiles/s; the host pipeline
must feed it. This measures `bn_read_decode_batch` (the production
TileBatcher path: tfrecord framing -> proto walk -> JPEG decode, GIL
released, internal thread pool with an atomic work queue):

* tiles/s and CPU-seconds/tile at threads = 1, 2, 4, 8 on this box;
* the dev box has ONE core, so wall-clock cannot show multicore speedup
  — the honest contract is (a) CPU cost per tile, (b) demonstrated
  absence of contention pathology when oversubscribed (wall time flat as
  threads increase on 1 core), and (c) the serial fraction (file read +
  proto walk, measured separately) for the Amdahl projection;
* projected co-located rate at C cores =
  C / cpu_per_tile, derated by the serial read fraction.

Run: python benchmarks/bench_host_decode.py [n_tiles] [tile_px]
"""

import io
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_tfrecord(path, n_tiles, tile_px, quality=75):
    """Realistic corpus: JPEG tiles with low-frequency structure + noise
    (compresses like histology: ~30-60 KB at 299px q75, not flat-field)."""
    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:tile_px, 0:tile_px].astype(np.float32)
    sizes = []
    with TFRecordWriter(path) as w:
        for i in range(n_tiles):
            base = (
                128
                + 60 * np.sin(xx / (9 + i % 7) + i)
                + 50 * np.cos(yy / (11 + i % 5))
            )
            img = np.clip(
                base[..., None] + rng.normal(0, 18, (tile_px, tile_px, 3)),
                0, 255,
            ).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=quality)
            sizes.append(buf.tell())
            w.write_tile(f"slide{i % 16}", buf.getvalue(), loc_x=i, loc_y=0)
    return float(np.mean(sizes))


def cpu_now():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def main():
    n_tiles = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    tile_px = int(sys.argv[2]) if len(sys.argv) > 2 else 299

    from biscuit_tpu.data.native_loader import (
        native_index_tfrecord, native_read_decode_batch)

    path = "/tmp/bench_host_decode.tfrecords"
    mean_jpeg = build_tfrecord(path, n_tiles, tile_px)
    offsets = native_index_tfrecord(path)
    print(f"n_tiles={n_tiles} tile_px={tile_px} "
          f"mean_jpeg_bytes={mean_jpeg:.0f}")

    # Serial fraction: framing read + proto walk without decode is not
    # separately exposed; approximate with raw file read (the serial
    # prefix in bn_read_decode_batch) — decode dominates by >100x.
    t0 = time.perf_counter()
    with open(path, "rb") as f:
        data = f.read()
    t_read = time.perf_counter() - t0
    print(f"serial file read: {t_read*1e3:.1f} ms "
          f"({len(data)/1e6:.0f} MB) -> {t_read/n_tiles*1e6:.1f} us/tile")

    # This dev VM suffers heavy, bursty CPU steal (observed 10x swings in
    # both wall AND rusage CPU time for identical work). The best-case
    # (steal-free) cost is the MINIMUM over repeated rounds — report that
    # as the hardware number; the sweep across thread counts shows the
    # absence of contention pathology (min times flat on 1 core).
    rounds = 5
    results = {}
    native_read_decode_batch(path, offsets[:64], tile_px)  # warm
    for threads in (1, 2, 4, 8):
        walls, cpus = [], []
        for _ in range(rounds):
            c0, t0 = cpu_now(), time.perf_counter()
            _imgs, _s, _l, _lab, ok = native_read_decode_batch(
                path, offsets, tile_px, threads=threads)
            walls.append(time.perf_counter() - t0)
            cpus.append(cpu_now() - c0)
            assert ok == n_tiles, (ok, n_tiles)
        wall, cpu = min(walls), min(cpus)
        results[threads] = (wall, cpu)
        print(f"threads={threads}: best {n_tiles/wall:8.0f} tiles/s wall   "
              f"cpu {cpu/n_tiles*1e6:6.0f} us/tile   "
              f"(worst round {n_tiles/max(walls):.0f} tiles/s — VM steal)")

    cpu_per_tile = min(c for _, c in results.values()) / n_tiles
    serial_per_tile = t_read / n_tiles
    n_cores = os.cpu_count()
    print(f"this box: {n_cores} core(s)")
    for cores in (1, 2, 4, 8, 16):
        # Amdahl with the serial read prefix
        rate = 1.0 / (serial_per_tile + cpu_per_tile / cores)
        print(f"projected @ {cores:2d} cores: {rate:8.0f} tiles/s"
              + ("  >= 4.1k device rate" if rate >= 4100 else ""))
    import json

    print(json.dumps({
        "metric": "host_decode_cpu_us_per_tile",
        "value": round(cpu_per_tile * 1e6, 1),
        "single_thread_tiles_per_s": round(n_tiles / results[1][0], 0),
        "projected_8core_tiles_per_s": round(
            1.0 / (serial_per_tile + cpu_per_tile / 8), 0),
    }))


if __name__ == "__main__":
    main()
