"""Ladder at scale: 8 sizes x full 6-step protocol incl. nested CV,
concurrent submeshes (VERDICT r2 item 5).

The published protocol (reference experiment.py:21-45, README:127) is 23
sizes x 3 folds x {CV, UQ, 15 nested, FULL} ~= 1000 models; prior rounds
had only ever run 2 sizes x steps 2/3/5/6 in one sitting. This script
runs the largest synthetic end-to-end exercise the 1-core dev box can
carry: 8 ladder sizes (two of them >= 50 slides so step 4's nested UQ CV
actually runs, incl. 'AA' which also triggers step 1's full-epoch sweep),
all 6 steps, n_submeshes=2 over the 8-virtual-device CPU mesh, then
results() + display() asserting the full artifact tree.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/run_ladder_at_scale.py
Wall times per phase land on stdout; recorded in PARITY.md.
"""

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

# The ladder: 8 sizes; AA ('full') and G are >= 50 slides -> step 4 runs
# for them; AA is a FULL_EPOCH_EXPS member -> step 1 runs.
LADDER = {
    "AA": {"out1": 32, "out2": 32},
    "G": {"out1": 25, "out2": 25},
    "Y": {"out1": 15, "out2": 15},
    "Z": {"out1": 12, "out2": 12},
    "ZA": {"out1": 10, "out2": 10},
    "ZB": {"out1": 8, "out2": 8},
    "ZC": {"out1": 6, "out2": 6},
    "ZD": {"out1": 4, "out2": 4},
}
N_TRAIN_SLIDES = 64  # max(out1)+max(out2)
N_EVAL_SLIDES = 16


def write_tiles(tfr_dir, slide, label, hard, rng, n=10):
    """Tile corpus in the tests/test_experiment.py style (class signal in
    R/B channels) but with stronger signal density: 55% signal tiles on
    normal slides, 15% on 'hard' slides — small ladder sizes then have
    detectable tile AUCs so the UQ-thresholded arm materializes for more
    than just the >=50-slide sizes (the test-suite corpus is deliberately
    weaker, which left only AA with include-rows in the first run)."""
    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter

    with TFRecordWriter(str(tfr_dir / f"{slide}.tfrecords")) as w:
        for t in range(n):
            img = rng.integers(40, 120, (32, 32, 3)).astype(np.uint8)
            if rng.random() < (0.15 if hard else 0.55):
                ch = 0 if label == 0 else 2
                img[..., ch] = np.clip(img[..., ch] + 100, 0, 255)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            w.write_tile(slide, buf.getvalue(), loc_x=t, loc_y=0)


def build_project(tmp, name, n_slides, seed):
    from pathlib import Path

    from biscuit_tpu.project import Project

    tmp = Path(tmp)
    rng = np.random.default_rng(seed)
    rows = []
    tfr = tmp / f"{name}_tfr"
    tfr.mkdir(parents=True)
    for i in range(n_slides):
        label = i % 2
        slide = f"{name}sl{i}"
        hard = (i % 5) == 0
        rows.append(dict(
            patient=f"{name}P{i}", slide=slide,
            cohort="LUAD" if label == 0 else "LUSC",
            site=f"{i // 2}",
        ))
        write_tiles(tfr, slide, label, hard, rng)
    ann_path = str(tmp / f"{name}_ann.csv")
    pd.DataFrame(rows).to_csv(ann_path, index=False)
    P = Project(str(tmp / name), annotations=ann_path, name=name,
                create=True)
    P.add_source("SRC", tfrecords=str(tfr))
    return P


def main():
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")

    from biscuit_tpu.experiment import Experiment
    from biscuit_tpu.hp import ModelParams

    root = tempfile.mkdtemp(prefix="ladder_scale_")
    print(f"workdir: {root}")
    t_all = time.perf_counter()
    train_P = build_project(root, "tr", N_TRAIN_SLIDES, seed=0)
    eval_P = build_project(root, "ev", N_EVAL_SLIDES, seed=1)
    print(f"corpus built: {time.perf_counter() - t_all:.1f}s")

    exp = Experiment(
        train_P, eval_projects=[eval_P], outcome="cohort",
        outcome1="LUAD", outcome2="LUSC",
        outdir=os.path.join(root, "results"),
    )
    exp.train_kwargs = {"seed": 0, "n_submeshes": 2}
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=16,
        epochs=[1], early_stop=False, dropout=0.1, uq=True,
        hidden_layer_width=32, hidden_layers=2, learning_rate=3e-3,
        normalizer=None, augment="xy", uq_samples=4,
    )

    times = {}
    for step in (1, 2, 3, 4, 5, 6):
        t0 = time.perf_counter()
        exp.run(LADDER, steps=[step], hp=hp.copy())
        times[f"step{step}"] = time.perf_counter() - t0
        print(f"== step {step} done in {times[f'step{step}']:.1f}s ==",
              flush=True)

    t0 = time.perf_counter()
    df, eval_dfs = exp.results(LADDER, uq=True, eval=True)
    times["results"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    exp.display(df, eval_dfs, ttest_uq_groups=None)
    times["display"] = time.perf_counter() - t0
    total = time.perf_counter() - t_all

    # --- artifact-tree assertions -------------------------------------
    from os.path import exists, join

    assert exists(join(exp.outdir, "crossval.svg"))
    assert len(df), "empty results frame"
    ids = set(df["id"])
    assert ids >= set(LADDER), f"missing ladder ids: {set(LADDER) - ids}"
    # The UQ-thresholded arm requires detectable thresholds; on weak folds
    # the reference skips them identically. The protocol guarantees the
    # nested-derived arm at the full size.
    uq_ids = set(df[df["uq"] == "include"]["id"])
    assert "AA" in uq_ids, f"nested-UQ rows missing for AA (got {uq_ids})"
    print(f"UQ include-arm sizes: {sorted(uq_ids)}")
    for name, edf in eval_dfs.items():
        assert len(edf), f"empty eval frame for {name}"
    models_dir = train_P.models_dir
    n_models = len(os.listdir(models_dir))
    print(f"model dirs: {n_models}")
    assert n_models >= 80, n_models

    print("phase breakdown:")
    for k, v in times.items():
        print(f"  {k:8s} {v:8.1f}s")
    print(f"TOTAL: {total:.1f}s  ({n_models} model dirs, "
          f"{len(df)} result rows, 8 sizes, submeshes=2)")


if __name__ == "__main__":
    main()
