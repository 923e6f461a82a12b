"""The COMPLETE published experiment matrix, end-to-end, in one resumable
run (VERDICT r4 item 1).

Drives every arm the reference's train.py:61-96 defines — the 23-size
ladder forward/reverse over both orderings (4 x 23 = 92 experiments), the
3:1/10:1 class-ratio arm on AMDPGZ with class inverses (48), and the
GAN-fraction arm 10-50% x 14 sizes x 2 orders (140) — 280 experiments,
all 6 protocol steps each, against the REAL TCGA annotations
(/root/reference/annotations/tcga.csv, 991 data rows) with the REAL CPTAC
annotations (1306 rows) as the external evaluation project. Tile data is
synthetic (the slides themselves are not shipped): 6 tiny 32px tiles per
slide with a class-correlated signal, matching the ladder-at-scale
corpus recipe (run_ladder_at_scale.py).

GAN padding: the shipped tcga.csv carries only 25 GAN rows per class,
while the largest GAN config (R at 50%) needs round(0.5*250) = 125 per
class — the reference's own `add` assert (experiment.py:135-138) makes
40% of its shipped GAN matrix infeasible on its shipped annotations
(pinned in tests/test_matrix.py::test_gan_feasibility_on_shipped_
annotations). Since the paper's GAN slides are StyleGAN2 synthetics that
were never shipped, this run pads the annotations with clearly-marked
synthetic GAN rows (slide names GANPAD*, site='GAN') up to 125 per class
so the complete grid executes; the real 50 GAN rows are kept verbatim.

Resumability: the workdir persists (BISCUIT_MATRIX_DIR, default
/tmp/biscuit_full_matrix); re-running skips the built corpus and every
completed (experiment, fold) via Experiment.run's results_log.csv checks,
so a crash/preemption resumes where it left off — the property the
full-matrix run is meant to prove at scale.

Run:  python benchmarks/run_full_matrix.py [--arms reg1,rev1] [--results-only]
Phase wall times land on stdout and matrix_report.json; recorded in
PARITY.md. Reference: train.py:61-96, experiment.py:21-45, README.md:127
("~1000 models, so this may take a while").

Config tuning for the 1-core box (A/B on the R,Z reg1 subset, 44
trainings, warm compile cache, 2026-08-20): virtual-device count x
n_submeshes {8x2: 208 s, 8x1: 153 s, 2x2: 184 s, 1x1: 117 s}. Two
scheduler worker threads on ONE physical core cost 21-36% (GIL/cache
thrash), and per-training data-parallel sharding over k virtual devices
adds pure dispatch+collective overhead — on real TPU topologies both are
wins, on a 1-core CPU host both are losses.

Full-sitting tuning (same box, later that day): three wall-time sinks
were measured and removed so the COMPLETE 5,620-training grid fits one
sitting on one core:
  * eager flax ``model.init`` cost ~1.4 s/training (28% of wall) and
    ~200 one-time eager-op compiles — trainer.init_model is now jitted +
    cached per module structure (bit-identical params, ~1.5 ms replay);
  * nothing enabled the persistent XLA compile cache in this driver, so
    every invocation re-compiled the train/infer programs cold (~20 s
    EACH, twice for the train step — the first call compiles with
    single-device init placements, the second with the steady-state
    replicated layout). The driver now pins the same
    ~/.cache/biscuit_jax cache the test conftest uses: warm re-runs
    reload each program in ~2.5 s, once per process;
  * steady-state step cost is 79 ms on a 1-device mesh vs 105 ms over 2
    virtual devices (pure dispatch+collective overhead at this size).
The driver therefore defaults to ONE virtual device x ONE submesh
(sequential dispatch; BISCUIT_MATRIX_SUBMESHES / XLA_FLAGS override) —
the submesh scheduler + distributed work queue are exercised at scale by
benchmarks/run_ladder_at_scale.py and the 2x2 A/B above, while the
full-matrix sitting optimizes for completing all 280 experiments.
Measured after the fixes: the reg1 Z-only run (22 trainings) fell from
117 s to ~55 s warm.
"""

import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    # 1 virtual device: see the full-sitting tuning note above.
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=1").strip()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

REF_ANN = "/root/reference/annotations"
WORKDIR = os.environ.get("BISCUIT_MATRIX_DIR", "/tmp/biscuit_full_matrix")
# The full grid is 5,620 trainings + 280 evals (tests/test_matrix.py math);
# per-training compute is sized for THIS 1-core box: 2 tiles/slide and
# batch 32 keep every rung >= 1 padded step (trainer.py: steps_per_epoch =
# max(1, n_tiles // batch)) while the protocol machinery — splits,
# scheduling, thresholds, results assembly — runs at full scale.
TILES_PER_SLIDE = 2       # training corpus
EVAL_TILES_PER_SLIDE = 2  # eval corpus (1306 slides -> 2612 tiles/eval)
GAN_PAD_PER_CLASS = 100   # 25 shipped + 100 pad = 125 = max need (R_g50)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def write_tiles(tfr_dir, slide, label, hard, rng, n):
    """Class-signal tile corpus (run_ladder_at_scale.py recipe: signal in
    the R/B channel, 55% signal density on normal slides, 15% on 'hard'
    ones so slide-level errors exist for UQ threshold detection)."""
    from PIL import Image

    from biscuit_tpu.data.tfrecord import TFRecordWriter

    with TFRecordWriter(os.path.join(tfr_dir, f"{slide}.tfrecords")) as w:
        for t in range(n):
            img = rng.integers(40, 120, (32, 32, 3)).astype(np.uint8)
            if rng.random() < (0.15 if hard else 0.55):
                ch = 0 if label == 0 else 2
                img[..., ch] = np.clip(img[..., ch] + 100, 0, 255)
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            w.write_tile(slide, buf.getvalue(), loc_x=t, loc_y=0)


def build_training_annotations(dst):
    """Real tcga.csv + GAN pad rows (order/order2 continue past the real
    rows so pad slides sort after every real slide in both orderings)."""
    ann = pd.read_csv(os.path.join(REF_ANN, "tcga.csv"), dtype=str)
    next_order = int(pd.to_numeric(ann["order"]).max()) + 1
    pad = []
    for c, cohort in enumerate(("LUAD", "LUSC")):
        for i in range(GAN_PAD_PER_CLASS):
            o = next_order + c * GAN_PAD_PER_CLASS + i
            pad.append(dict(
                patient=f"GANPAD{cohort[2]}{i}", slide=f"GANPAD{cohort[2]}{i}",
                cohort=cohort, order=str(o), order2=str(o), site="GAN",
            ))
    out = pd.concat([ann, pd.DataFrame(pad)], ignore_index=True)
    out.to_csv(dst, index=False)
    return out


def build_corpus(workdir):
    """Idempotent: training project on the real (padded) tcga.csv, eval
    project on the real cptac.csv, synthetic tiles per slide."""
    from biscuit_tpu.project import Project

    marker = os.path.join(workdir, "CORPUS_DONE")
    if os.path.exists(marker):
        log("corpus already built; resuming")
        return (Project(os.path.join(workdir, "training")),
                Project(os.path.join(workdir, "evaluation")))

    t0 = time.perf_counter()
    os.makedirs(workdir, exist_ok=True)
    tr_ann_path = os.path.join(workdir, "tcga_padded.csv")
    tr_ann = build_training_annotations(tr_ann_path)
    ev_ann_path = os.path.join(workdir, "cptac.csv")
    ev_ann = pd.read_csv(os.path.join(REF_ANN, "cptac.csv"), dtype=str)
    ev_ann.to_csv(ev_ann_path, index=False)

    rng = np.random.default_rng(0)
    tr_tfr = os.path.join(workdir, "train_tfr")
    os.makedirs(tr_tfr, exist_ok=True)
    for i, row in enumerate(tr_ann.itertuples(index=False)):
        label = 0 if row.cohort == "LUAD" else 1
        write_tiles(tr_tfr, row.slide, label, hard=(i % 5 == 0), rng=rng,
                    n=TILES_PER_SLIDE)
    log(f"training corpus: {len(tr_ann)} slides "
        f"({time.perf_counter() - t0:.0f}s)")

    ev_tfr = os.path.join(workdir, "eval_tfr")
    os.makedirs(ev_tfr, exist_ok=True)
    for i, row in enumerate(ev_ann.itertuples(index=False)):
        label = 0 if row.cohort == "LUAD" else 1
        write_tiles(ev_tfr, row.slide, label, hard=(i % 5 == 0), rng=rng,
                    n=EVAL_TILES_PER_SLIDE)
    log(f"eval corpus: {len(ev_ann)} slides "
        f"({time.perf_counter() - t0:.0f}s total)")

    train_P = Project(os.path.join(workdir, "training"),
                      annotations=tr_ann_path, name="training", create=True)
    train_P.add_source("TCGA", tfrecords=tr_tfr)
    eval_P = Project(os.path.join(workdir, "evaluation"),
                     annotations=ev_ann_path, name="evaluation", create=True)
    eval_P.add_source("CPTAC", tfrecords=ev_tfr)
    with open(marker, "w") as f:
        f.write("ok")
    return train_P, eval_P


def tiny_hp():
    from biscuit_tpu.hp import ModelParams

    return ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=32,
        epochs=[1], early_stop=False, dropout=0.1, uq=True,
        hidden_layer_width=32, hidden_layers=2, learning_rate=3e-3,
        normalizer=None, augment="xy", uq_samples=2,
    )


def count_models(P):
    d = P.models_dir
    return len(os.listdir(d)) if os.path.isdir(d) else 0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default=None,
                    help="Comma-separated arm subset (default: all).")
    ap.add_argument("--subset", default=None,
                    help="Comma-separated ladder-size subset (smoke runs).")
    ap.add_argument("--results-only", action="store_true",
                    help="Skip training; only assemble results/figures.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache (same location as tests/conftest.py): the
    # grid's handful of distinct step programs reload in ~2.5 s instead of
    # recompiling ~20 s cold on every invocation/resume.
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("BISCUIT_JAX_CACHE",
                           os.path.expanduser("~/.cache/biscuit_jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from biscuit_tpu.experiment import Experiment, published_matrix

    t_all = time.perf_counter()
    train_P, eval_P = build_corpus(WORKDIR)
    outdir = os.path.join(WORKDIR, "results")

    exp = Experiment(
        train_P, eval_projects=[eval_P], outcome="cohort",
        outcome1="LUAD", outcome2="LUSC", outdir=outdir,
    )
    exp.train_kwargs = {
        "seed": 0,
        "n_submeshes": int(os.environ.get("BISCUIT_MATRIX_SUBMESHES", "1")),
    }

    full_grid = args.arms is None and args.subset is None
    matrix = published_matrix(
        ladder=args.subset.split(",") if args.subset else None)
    if args.arms:
        keep = args.arms.split(",")
        matrix = {k: v for k, v in matrix.items() if k in keep}
    n_exps = sum(len(g) for g in matrix.values())
    log(f"matrix: {n_exps} experiments over arms {list(matrix)}")

    report_path = os.path.join(WORKDIR, "matrix_report.json")
    report = {"arms": {}, "n_experiments": n_exps}
    if os.path.exists(report_path):
        with open(report_path) as f:
            report = json.load(f)
        report["n_experiments"] = n_exps

    if not args.results_only:
        for arm, cfg in matrix.items():
            t0 = time.perf_counter()
            m0 = count_models(train_P)
            log(f"== arm {arm}: {len(cfg)} experiments, 6 steps ==")
            exp.run(cfg, steps=[1, 2, 3, 4, 5, 6], hp=tiny_hp())
            dt = time.perf_counter() - t0
            m1 = count_models(train_P)
            report["arms"][arm] = {
                "experiments": len(cfg), "wall_s": round(dt, 1),
                "new_model_dirs": m1 - m0, "total_model_dirs": m1,
            }
            with open(report_path, "w") as f:
                json.dump(report, f, indent=1)
            log(f"== arm {arm} done in {dt:.0f}s "
                f"({m1 - m0} new model dirs, {m1} total) ==")

    # --- results assembly + figures (the reference results.py flow) ----
    t0 = time.perf_counter()
    from biscuit_tpu.cli.results import show_results

    have_reg = bool(matrix.get("reg1"))
    have_ratio = bool(matrix.get("ratio_10"))
    have_gan = bool(matrix.get("gan"))
    show_results.callback(
        train_project=train_P.root, eval_projects=[eval_P.root],
        outcome="cohort", outdir=outdir, reg=have_reg, ratio=have_ratio,
        umaps=False, heatmaps=False, heatmap_slide=None, gan=have_gan,
        subset=args.subset,
    )
    report["results_wall_s"] = round(time.perf_counter() - t0, 1)

    # --- artifact-tree assertions (gated on the arms actually run) ------
    from os.path import exists, join

    df = rdf = gdf = pd.DataFrame()
    if have_reg:
        # crossval_results.csv is written by EVERY exp.results() call
        # (reference experiment.py:750 does the same), so after a full
        # sitting it holds the LAST section's frame (the GAN n=500 UQ
        # pass) — a reference-faithful last-write contract. Reg-arm
        # coverage is asserted from evaluation_results.csv instead,
        # which only the reg pass (eval=True) writes.
        df = pd.read_csv(join(outdir, "crossval_results.csv"))
        assert len(df), "empty cross-val results frame"
        ev = pd.read_csv(join(outdir, "evaluation_results.csv"))
        ids = set(ev["id"])
        missing = {lbl for g in ("reg1", "reg2", "rev1", "rev2")
                   for lbl in matrix.get(g, {})} - ids
        assert not missing, f"reg arm ids missing from eval results: {missing}"
        assert exists(join(outdir, "reg_crossval.svg"))
    if have_ratio:
        for artifact in ("ratio_results.csv", "ratio_comparison_crossval.svg",
                         "ratio3_crossval.svg", "ratio10_crossval.svg"):
            assert exists(join(outdir, artifact)), f"missing {artifact}"
        rdf = pd.read_csv(join(outdir, "ratio_results.csv"))
        assert set(rdf["ratio"].astype(str)) == {"1", "3", "10"}
    if have_gan:
        for artifact in ("gan_results.csv", "gan_crossval.svg",
                         "gan_uq_crossval.svg"):
            assert exists(join(outdir, artifact)), f"missing {artifact}"
        gdf = pd.read_csv(join(outdir, "gan_results.csv"))
        assert set(gdf["gan_fraction"]) == {10, 20, 30, 40, 50}

    n_models = count_models(train_P)
    total = time.perf_counter() - t_all
    report.update({
        "total_model_dirs": n_models,
        "crossval_rows": len(df),
        "ratio_rows": len(rdf),
        "gan_rows": len(gdf),
        "wall_s_this_invocation": round(total, 1),
    })
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    log(f"FULL MATRIX COMPLETE: {n_exps} experiments, {n_models} model "
        f"dirs, {len(df)} cross-val rows, {len(rdf)} ratio rows, "
        f"{len(gdf)} gan rows; this invocation {total:.0f}s")
    log(f"report -> {report_path}")


if __name__ == "__main__":
    main()
