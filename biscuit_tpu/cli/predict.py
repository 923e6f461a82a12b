"""Servable batch-scoring CLI: artifact + tfrecords -> predictions CSV.

Completes the deployment loop of :mod:`biscuit_tpu.serve`: score a tile
corpus anywhere with ONLY the artifact file — no Flax, no checkpoint, no
model code — and get back the reference's tile-prediction contract
(slide, loc_x, loc_y, {outcome}_y_true0/_y_pred{i}/_uncertainty{i} —
reference experiment.py:694-698), so the frames feed straight into
`threshold.from_cv/apply` and the rest of the stats pipeline. The
reference has no counterpart: its scoring loop re-imports the full
slideflow/TF stack per process (/root/reference/results.py:234-257).

    python -m biscuit_tpu.cli.predict ARTIFACT tiles/*.tfrecords -o out.csv

With more than one local device the artifact is fanned out data-parallel
over the mesh (serve.ShardedServable) unless --no-sharded is passed.
"""

from __future__ import annotations

import os
import time
from glob import glob

import click

from ..utils_log import log


_SLIDE_EXTS = (".svs", ".tif", ".tiff", ".png", ".jpg", ".jpeg")


def _expand(paths, slides=False):
    pats = _SLIDE_EXTS if slides else (".tfrecords",)
    out = []
    for p in paths:
        if os.path.isdir(p):
            for ext in pats:
                out.extend(sorted(glob(os.path.join(p, f"*{ext}"))))
        else:
            out.append(p)
    if not out:
        raise click.UsageError(
            f"no {'slides' if slides else 'tfrecords'} found")
    return out


def _labels_from_annotations(annotations, outcome, classes=None):
    """slide -> int label with the Dataset.labels convention (sorted unique
    outcome values -> stable class index; dataset.py:83-98).

    ``classes`` pins the TRAINING-time class order (from --classes or the
    artifact's ``outcome_labels`` header). Without it, a predict-time CSV
    holding a subset (one class) or a superset (an extra value) of the
    training outcomes would silently remap indices relative to training,
    flipping y_true0 and every downstream AUC — so a mismatch is an error,
    not a reindex."""
    import pandas as pd

    # dtype=str matches the project/Dataset.labels convention (project.py
    # reads annotations as strings): numeric-looking slide IDs must join
    # against the tfrecords' string slide names, and numeric outcome codes
    # must sort as strings — the order the model was trained with.
    df = pd.read_csv(annotations, dtype=str)
    if "slide" not in df.columns or outcome not in df.columns:
        raise click.UsageError(
            f"annotations must have 'slide' and {outcome!r} columns")
    sub = df[["slide", outcome]].dropna()
    seen = sorted(sub[outcome].unique().tolist())
    if classes is not None:
        classes = [str(c) for c in classes]
        extra = [v for v in seen if v not in classes]
        if extra:
            raise click.UsageError(
                f"annotations carry outcome values {extra} not in the "
                f"training class order {classes} — wrong annotations file "
                "or wrong --outcome column")
        unique = classes
    else:
        unique = seen
        if len(seen) < 2:
            raise click.UsageError(
                f"annotations contain only one outcome value ({seen}); "
                "class indices derived from them would not match training "
                "— pass --classes with the training label order (or use an "
                "artifact exported with outcome_labels metadata)")
    index = {name: i for i, name in enumerate(unique)}
    return {s: index[v] for s, v in zip(sub["slide"], sub[outcome])}, unique


@click.command()
@click.argument("artifact")
@click.argument("tfrecords", nargs=-1, required=True)
@click.option("-o", "--out", default="tile_predictions.csv",
              show_default=True, help="Output CSV (or .parquet.gzip with "
                                      "--parquet).")
@click.option("--annotations", default=None,
              help="Annotations CSV supplying y_true (slide + outcome "
                   "columns); without it y_true0 is -1.")
@click.option("--outcome", default="cohort", show_default=True,
              help="Outcome name (column prefix + annotations column).")
@click.option("--sharded/--no-sharded", default=None,
              help="Fan the artifact over all local devices (default: "
                   "sharded when more than one device is visible).")
@click.option("--max-tiles", default=None, type=int,
              help="Per-tfrecord (or, with --slides, per-slide) tile cap.")
@click.option("--classes", default=None,
              help="Comma-separated training class order (overrides the "
                   "artifact's outcome_labels header); y_true indices are "
                   "validated against it instead of being derived from "
                   "whatever values the annotations happen to contain.")
@click.option("--seed", default=None, type=int,
              help="PRNG seed pinning the MC-dropout streams; default: "
                   "the servable's fixed internal stream (PRNGKey(0)) — "
                   "unseeded runs in a fresh process are also "
                   "deterministic.")
@click.option("--parquet", is_flag=True,
              help="Write parquet.gzip instead of CSV (the slideflow 1.2 "
                   "variant the reference also reads).")
@click.option("--slides", is_flag=True,
              help="Inputs are whole-slide images (.svs/.tif/...), scored "
                   "directly off the tile grid — no extraction step.")
@click.option("--tile-um", default=None, type=int,
              help="Tile microns for --slides (default: the artifact's).")
@click.option("--mpp", default=None, type=float,
              help="Microns/pixel override for --slides inputs without "
                   "resolution metadata (plain PNG/JPEG).")
@click.option("--qc", default="both", show_default=True,
              help="--slides tile QC: both|otsu|blur|none.")
@click.option("--distributed", "dist_workdir", default=None,
              help="Fleet scoring: run this command on EVERY host of a "
                   "multi-process runtime; hosts claim tfrecords from the "
                   "coordination-service work queue and shards merge "
                   "through this SHARED directory. The output file is "
                   "written by the main process only.")
def main(artifact, tfrecords, out, annotations, outcome, sharded, max_tiles,
         classes, seed, parquet, slides, tile_um, mpp, qc, dist_workdir):
    """Score TFRECORDS (files or directories of {slide}.tfrecords — or
    slide images with --slides) with ARTIFACT and write a
    reference-contract tile predictions frame."""
    import jax

    from ..serve import (
        load_servable,
        load_sharded_servable,
        predict_slides,
        predict_slides_distributed,
        predict_tfrecords,
        predict_tfrecords_distributed,
    )

    if dist_workdir is not None:
        from ..parallel import distributed

        distributed.initialize()

    paths = _expand(tfrecords, slides=slides)

    if sharded is None:
        sharded = len(jax.local_devices()) > 1
    if sharded:
        mesh = None
        if dist_workdir is not None:
            from ..parallel.mesh import data_parallel_mesh

            # Work-queue scoring is per-host independent: the fan-out mesh
            # must span only THIS host's devices. A global mesh would make
            # the scoring program a fleet-collective and deadlock against
            # the per-host claim schedule (guarded in
            # predict_tfrecords_distributed).
            mesh = data_parallel_mesh(jax.local_devices())
        sv = load_sharded_servable(artifact, mesh=mesh)
    else:
        sv = load_servable(artifact)
    step = getattr(sv, "global_batch", sv.batch_size)
    log.info(
        f"{'sharded ' if sharded else ''}servable: {sv.tile_px}px, "
        f"K={sv.k}, {step} tiles/dispatch, platforms={sv.platforms}")

    labels = {}
    if annotations is not None:
        if slides:
            raise click.UsageError(
                "--annotations applies to tfrecord scoring (slides carry "
                "no tile labels)")
        # Training class order: explicit --classes wins, else the
        # artifact's outcome_labels header; without either, derivation
        # from the annotations requires >=2 classes (guarded in
        # _labels_from_annotations).
        pinned = ([c for c in classes.split(",")] if classes
                  else sv.header.get("outcome_labels"))
        labels, unique = _labels_from_annotations(annotations, outcome,
                                                  classes=pinned)
        src = ("--classes" if classes else
               "artifact" if pinned else "annotations")
        log.info(f"labels: {unique} (order from {src})")

    key = None if seed is None else jax.random.PRNGKey(seed)
    t0 = time.perf_counter()
    if slides and dist_workdir is not None:
        df = predict_slides_distributed(
            sv, paths, dist_workdir, tile_um=tile_um, mpp=mpp,
            qc=None if qc == "none" else qc, outcome=outcome,
            max_tiles=max_tiles, key=key)
    elif slides:
        df = predict_slides(sv, paths, tile_um=tile_um, mpp=mpp,
                            qc=None if qc == "none" else qc,
                            outcome=outcome, max_tiles=max_tiles, key=key)
    elif dist_workdir is not None:
        df = predict_tfrecords_distributed(
            sv, paths, dist_workdir, labels=labels, outcome=outcome,
            max_tiles=max_tiles, key=key)
    else:
        df = predict_tfrecords(sv, paths, labels=labels, outcome=outcome,
                               max_tiles=max_tiles, key=key)
    dt = time.perf_counter() - t0
    if dist_workdir is not None:
        from ..parallel.distributed import is_main

        if not is_main():
            # Every host holds the identical merged frame; the shared-fs
            # output file is main's to write (same rule as the trainer's
            # artifact writes).
            log.info(f"{len(df)} tiles merged; main writes {out}")
            return
    if parquet:
        # Only rewrite an explicit .csv suffix (incl. the default name);
        # any other -o value is written verbatim as parquet.
        if out.endswith(".csv"):
            out = out[:-len(".csv")] + ".parquet.gzip"
        df.to_parquet(out, compression="gzip")
    else:
        df.to_csv(out, index=False)
    log.info(f"{len(df)} tiles from {len(paths)} slides in {dt:.1f}s "
             f"({len(df) / max(dt, 1e-9):.0f} tiles/s incl. host decode)")
    click.echo(out)


if __name__ == "__main__":
    main()
