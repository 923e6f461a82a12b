"""External-evaluation driver: run a saved model on an eval project.

Stand-in for sf.Project.evaluate (SURVEY.md §2.3 E10; reference call site
experiment.py:917-922). Writes the eval-dir contract of SURVEY.md §2.4:
``{NNNNN-eval-}{outcome}-{label}-HP0_epoch{E}/`` containing
``results_log.csv``, ``patient_predictions_{outcome}_eval.csv``,
``slide_predictions_{outcome}_eval.csv`` and ``tile_predictions_eval.csv``
(read back at experiment.py:633-693). The 11-char directory prefix matches
utils.find_eval's slice (utils.py:331-334).
"""

from __future__ import annotations

import json
import os
from os.path import basename, join
from typing import Dict, Optional

import pandas as pd

from ..stats.roc import auc_score, average_precision
from ..utils_log import log
from .trainer import (
    group_predictions_frame,
    load_checkpoint,
    predict_tiles,
    tile_predictions_frame,
)


def _next_eval_number(eval_dir: str) -> int:
    existing = []
    for d in os.listdir(eval_dir):
        head = d.split("-", 1)[0]
        if head.isdigit():
            existing.append(int(head))
    return max(existing) + 1 if existing else 0


def evaluate_project(
    project,
    model_path: str,
    outcome: str,
    filters: Optional[Dict] = None,
    save_predictions=True,
    max_tiles: Optional[int] = None,
    mesh=None,
    collective: bool = True,
):
    """Evaluate a saved model over this project's dataset.

    Args:
        project: evaluation Project (annotations + tfrecords).
        model_path: path to a saved `..._epoch{E}` model dir.
        collective: under a multi-process runtime, True (default) means
            every process is calling this in lockstep — main runs the
            inference and publishes the metrics over the KV store. Pass
            False when only THIS process is running the eval (distributed
            fold scheduling in Experiment.run claims evals per host): it
            then runs fully locally with no cross-process exchange.
    Returns:
        dict of level -> (auc, ap) metrics; writes the eval dir.
    """
    import jax

    from ..parallel import distributed as dist

    # Multi-process runtime: evaluation does not shard across hosts (the
    # predictions frame is assembled host-side), so main runs it over its
    # local devices and publishes the metrics; the other processes block
    # on the exchange instead of racing eval-dir allocation / CSV writes
    # on the shared filesystem. One hour covers external evals of the
    # full CPTAC corpus with wide margin.
    multiproc = jax.process_count() > 1 and collective
    if multiproc and not dist.is_main():
        results = json.loads(dist.broadcast_from_main(
            "eval_results", None, timeout_ms=3_600_000))
        # JSON turns the (auc, ap) tuples into lists; restore the contract.
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in results.items()}

    model, params, batch_stats, hp, meta = load_checkpoint(model_path)
    label = meta["label"]
    epoch_name = basename(model_path.rstrip("/"))
    epoch = int(epoch_name.split("epoch")[-1])

    dataset = project.dataset(hp.tile_px, hp.tile_um, filters=filters)
    labels, unique = dataset.labels(outcome)
    patients = dataset.patients()
    tfrecords = dataset.tfrecords()
    log.info(f"Evaluating {label} on {project.name}: {len(tfrecords)} slides")

    n = _next_eval_number(project.eval_dir)
    # Prefix is exactly 11 chars ('{NNNNN}-eval-'): find_eval slices o[11:].
    out_dir = join(
        project.eval_dir, f"{n:05d}-eval-{outcome}-{label}-HP0_epoch{epoch}"
    )
    os.makedirs(out_dir, exist_ok=True)

    df, probs, unc = predict_tiles(
        params, batch_stats, model, hp, tfrecords, labels,
        mesh=mesh, max_tiles=max_tiles,
    )

    if save_predictions:
        tile_predictions_frame(outcome, df, probs, unc).to_csv(
            join(out_dir, "tile_predictions_eval.csv"), index=False
        )
    pt_df = group_predictions_frame(df, probs, patients, "patient")
    pt_df.to_csv(
        join(out_dir, f"patient_predictions_{outcome}_eval.csv"), index=False
    )
    sl_df = group_predictions_frame(df, probs, patients, "slide")
    sl_df.to_csv(
        join(out_dir, f"slide_predictions_{outcome}_eval.csv"), index=False
    )

    t_auc = auc_score(df["y_true"], probs[:, 1])
    t_ap = average_precision(df["y_true"], probs[:, 1])
    s_auc = auc_score(sl_df["y_true1"], sl_df["percent_tiles_positive1"])
    s_ap = average_precision(
        sl_df["y_true1"], sl_df["percent_tiles_positive1"]
    )
    p_auc = auc_score(pt_df["y_true1"], pt_df["percent_tiles_positive1"])
    p_ap = average_precision(
        pt_df["y_true1"], pt_df["percent_tiles_positive1"]
    )

    pd.DataFrame(
        [
            {
                "model_name": f"{outcome}-{label}-HP0_epoch{epoch}",
                "patient_auc": json.dumps({outcome: [p_auc]}),
                "patient_ap": json.dumps({outcome: [p_ap]}),
                "slide_auc": json.dumps({outcome: [s_auc]}),
                "slide_ap": json.dumps({outcome: [s_ap]}),
                "tile_auc": json.dumps({outcome: [t_auc]}),
                "tile_ap": json.dumps({outcome: [t_ap]}),
            }
        ]
    ).to_csv(join(out_dir, "results_log.csv"), index=False)

    results = {
        "eval_dir": out_dir,
        "tile": (t_auc, t_ap),
        "slide": (s_auc, s_ap),
        "patient": (p_auc, p_ap),
    }
    if multiproc:
        dist.broadcast_from_main(
            "eval_results", json.dumps(results), timeout_ms=3_600_000)
    return results
