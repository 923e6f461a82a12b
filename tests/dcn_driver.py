"""Multi-process DCN driver (spawned by test_distributed.py; not collected).

Exercises parallel/distributed.py for real across OS processes: each process
owns a few virtual CPU devices, ``distributed.initialize`` connects them
through JAX's distributed runtime (Gloo collectives stand in for DCN), each
process feeds its ``process_shard()`` slice of the global batch, and
``distributed.global_batch`` assembles the sharded jax.Arrays the pjit train
step consumes — exactly the multi-host recipe the module docstring
prescribes for TPU pods (SURVEY.md §2.5/§5.8; no reference counterpart, the
reference is single-process, experiment.py:753-922).

Usage: python dcn_driver.py PID NPROC COORDINATOR DEVS_PER_PROC OUTFILE \
           [e2e PROJECT_ROOT]
With NPROC=1 it runs the same computation single-process (the golden).
The optional ``e2e PROJECT_ROOT`` mode runs a full ``train_project`` fold
(k-fold + early-stop + UQ predictions) over a pre-built synthetic project
on the shared filesystem instead of the hand-rolled step loop.
"""

import json
import os
import sys


def _e2e(outfile, project_root):
    """Full train_project over the global mesh (every process runs this;
    main writes the artifact tree), then the external-eval path
    (evaluate_project gates inference to main and publishes the metrics
    over the coordination-service KV store)."""
    from glob import glob
    from os.path import join

    import jax

    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.project import Project

    P = Project(project_root)
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=True, early_stop_method="accuracy",
        dropout=0.1, hidden_layer_width=32, hidden_layers=1,
        learning_rate=3e-3, normalizer=None, augment="xy", uq=True,
        uq_samples=4)
    dirs = P.train(
        "cohort", exp_label="DCN_E2E", params=hp, val_strategy="k-fold",
        val_k=[1], val_k_fold=2, validate_on_batch=8, validation_steps=2,
        save_model=True)
    epoch_dirs = sorted(glob(join(dirs[0], "*_epoch1")))
    assert epoch_dirs, f"no saved epoch dir in {dirs[0]}"
    eval_res = P.evaluate(epoch_dirs[0], "cohort")
    with open(outfile, "w") as f:
        json.dump({"pid": jax.process_index(), "model_dirs": dirs,
                   "eval": eval_res}, f)
    print(f"proc {jax.process_index()}: E2E OK", flush=True)


def _local_mesh_mode(outfile, project_root):
    """Host-local meshes under a multi-process runtime: each process
    trains an INDEPENDENT experiment over its own devices (the mode
    parallel/scheduler.py's multi-process guard points users to). Must
    behave as an ordinary single-host training per process — no lockstep
    sharding, no artifact funneling to process 0, no KV exchanges."""
    import jax

    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.parallel.mesh import data_parallel_mesh
    from biscuit_tpu.project import Project

    pid = jax.process_index()
    P = Project(project_root)
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=False, dropout=0.1, hidden_layer_width=32,
        hidden_layers=1, learning_rate=3e-3, normalizer=None, augment="xy",
        uq=False)
    mesh = data_parallel_mesh(jax.local_devices())
    dirs = P.train(
        "cohort", exp_label=f"LOCAL_P{pid}", params=hp,
        val_strategy="k-fold", val_k=[1], val_k_fold=2, mesh=mesh)
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "model_dirs": dirs}, f)
    print(f"proc {pid}: LOCAL OK", flush=True)


def _distributed_ladder(outfile, project_root, n_submeshes=1):
    """Distributed fold scheduling (experiment.py run() under a
    multi-process runtime): train_kwargs={'n_submeshes': N} makes each
    process claim (experiment, fold) tasks from the coordination-service
    work queue and train them over N submeshes of its OWN devices on the
    shared artifact tree; steps close with fleet-wide status exchanges.
    Runs steps 2, 3, 5 and 6 of the protocol on one ladder size."""
    from os.path import join

    import jax

    from biscuit_tpu.experiment import Experiment
    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.project import Project

    pid = jax.process_index()
    P = Project(project_root)
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=False, dropout=0.1, hidden_layer_width=32,
        hidden_layers=1, learning_rate=3e-3, normalizer=None, augment="xy",
        uq=False, uq_samples=4)
    exp = Experiment(
        P, eval_projects=[P], outcome="cohort", outcome1="LUAD",
        outcome2="LUSC", outdir=join(project_root, "ladder_results"))
    exp.train_kwargs = {
        "seed": 0, "n_submeshes": int(n_submeshes),
        "validate_on_batch": 8, "validation_steps": 2,
    }
    # Record which tasks THIS process actually trained/evaluated — the
    # test asserts the claim queue really distributed work across hosts
    # and nothing ran twice.
    trained, evals = [], []
    orig_train = exp.train

    def _tracking_train(**kw):
        trained.append([kw["label"], list(kw.get("val_k") or [])])
        return orig_train(**kw)

    exp.train = _tracking_train
    orig_eval = P.evaluate

    def _tracking_eval(model, outcome, **kw):
        evals.append(model)
        return orig_eval(model, outcome, **kw)

    P.evaluate = _tracking_eval

    exp.run({"ZC": {"out1": 6, "out2": 6}}, steps=[2, 3, 5, 6], hp=hp)
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "trained": trained, "evals": len(evals)}, f)
    print(f"proc {pid}: LADDER OK", flush=True)


def _ckpt_crash_resume(outfile, project_root, crash_after, kill="exit"):
    """In-run Orbax checkpointing (SURVEY §5.4): train with periodic
    checkpoints; with ``crash_after`` > 0 the process dies after that many
    train steps. ``kill='exit'`` simulates a hard host loss (os._exit,
    checkpoint_every=2); ``kill='term'`` simulates a preemption notice
    (self-SIGTERM, checkpoint_every=4 so the forced save lands OFF the
    cadence) — the trainer must trap it, commit a checkpoint at the
    current step, and exit via the default handler. The relaunch
    (crash_after=0) must restore and finish the fold with the full
    artifact tree."""
    import signal

    import jax

    import biscuit_tpu.train.trainer as trainer_mod
    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.project import Project

    crash_after = int(crash_after)
    every = 2 if kill == "exit" else 4
    if crash_after:
        real = trainer_mod._cached_train_step
        calls = [0]

        def crashy(*a, **k):
            fn = real(*a, **k)

            def committed_ckpt():
                # Any COMMITTED Orbax step dir under the shared tree (tmp
                # suffixes are stripped atomically on commit).
                import glob
                return any(
                    os.path.basename(p).isdigit() for p in
                    glob.glob(os.path.join(project_root, "models", "*",
                                           "ckpt", "*")))

            def wrapped(*args):
                calls[0] += 1
                if kill == "term" and calls[0] == crash_after + 1:
                    # Preemption notice: deliver SIGTERM to self; the
                    # trainer's handler must checkpoint THIS step and
                    # re-raise. Training continues until that boundary.
                    print(f"proc {jax.process_index()}: SELF-SIGTERM "
                          f"after {crash_after} steps", flush=True)
                    os.kill(os.getpid(), signal.SIGTERM)
                elif kill == "exit" and calls[0] > crash_after and (
                        committed_ckpt() or calls[0] >= 11):
                    # Die hard mid-run (simulated host loss, not a clean
                    # exit) — async saves still in flight are lost; the
                    # relaunch takes the latest COMPLETE one. On a loaded
                    # box the async writer can lag, so wait for one commit
                    # (bounded: the 12-step fold must not finish) — a
                    # crash with zero committed checkpoints just tests
                    # cold-start resume, which is not this scenario.
                    print(f"proc {jax.process_index()}: CRASHING after "
                          f"{calls[0] - 1} steps", flush=True)
                    os._exit(17)
                return fn(*args)

            wrapped.lower = fn.lower  # trainer AOT-compiles via .lower()
            return wrapped

        trainer_mod._cached_train_step = crashy

    P = Project(project_root)
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=False, dropout=0.1, hidden_layer_width=32,
        hidden_layers=1, learning_rate=3e-3, normalizer=None, augment="xy",
        uq=False)
    dirs = P.train(
        "cohort", exp_label="CKPT_E2E", params=hp, val_strategy="k-fold",
        val_k=[1], val_k_fold=2, validate_on_batch=8, validation_steps=2,
        checkpoint_every=every)
    with open(outfile, "w") as f:
        json.dump({"pid": jax.process_index(), "model_dirs": dirs}, f)
    print(f"proc {jax.process_index()}: CKPT OK", flush=True)


def _distributed_ladder_failure(outfile, project_root):
    """Fleet-wide abort semantics: whichever host claims fold 2 raises an
    injected error; the step-boundary status exchange must surface a
    failure on EVERY host (the peer raises 'a peer host failed step 2'
    instead of hanging at the next barrier)."""
    from os.path import join

    import jax

    from biscuit_tpu.experiment import Experiment
    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.project import Project

    pid = jax.process_index()
    P = Project(project_root)
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=False, dropout=0.1, hidden_layer_width=32,
        hidden_layers=1, learning_rate=3e-3, normalizer=None, augment="xy",
        uq=False)
    exp = Experiment(
        P, outcome="cohort", outcome1="LUAD", outcome2="LUSC",
        outdir=join(project_root, "ladder_results"))
    exp.train_kwargs = {
        "seed": 0, "n_submeshes": 1, "validate_on_batch": 8,
        "validation_steps": 2,
    }
    orig_train = exp.train

    def _flaky_train(**kw):
        if kw.get("val_k") == [2]:
            raise RuntimeError("injected fold-2 failure")
        return orig_train(**kw)

    exp.train = _flaky_train
    try:
        exp.run({"ZC": {"out1": 6, "out2": 6}}, steps=[2], hp=hp)
        err = None
    except Exception as e:
        err = str(e)
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "error": err}, f)
    print(f"proc {pid}: LADDERFAIL OK", flush=True)


def _predict_distributed(outfile, workdir, fail=False):
    """Distributed servable scoring (serve.predict_tfrecords_distributed):
    each host claims whole tfrecords from the coordination-service work
    queue, scores them with its own servable, and every host returns the
    SAME merged frame. ``fail=True`` injects a scoring failure on
    whichever host claims sl3 — the status exchange must abort scoring on
    every host."""
    from glob import glob
    from os.path import join

    import jax

    from biscuit_tpu import serve

    pid = jax.process_index()
    art = join(workdir, "artifact.biscuit")
    if len(jax.local_devices()) > 1:
        # Sharded fan-out over THIS host's devices (the cli.predict
        # --distributed topology). A process-spanning mesh must be
        # rejected by the API guard — assert that first.
        from biscuit_tpu.parallel.mesh import data_parallel_mesh

        if jax.process_count() > 1:
            bad = serve.load_sharded_servable(art)  # global default mesh
            try:
                serve.predict_tfrecords_distributed(
                    bad, ["x.tfrecords"], join(workdir, "never"))
                raise AssertionError("process-spanning mesh not rejected")
            except ValueError as e:
                assert "fleet-collective" in str(e), e
        sv = serve.load_sharded_servable(
            art, mesh=data_parallel_mesh(jax.local_devices()))
    else:
        sv = serve.load_servable(art)
    tfrs = sorted(glob(join(workdir, "tfr", "*.tfrecords")))
    assert tfrs, f"no tfrecords under {workdir}"
    if fail:
        orig = serve.predict_tfrecords

        def flaky(servable, paths, **kw):
            if any(p.endswith("sl3.tfrecords") for p in paths):
                raise RuntimeError("injected scoring failure")
            return orig(servable, paths, **kw)

        serve.predict_tfrecords = flaky
    claimed_before = len(glob(join(workdir, "scored", "*.parquet")))
    try:
        df = serve.predict_tfrecords_distributed(
            sv, tfrs, join(workdir, "scored"), outcome="cohort",
            key=jax.random.PRNGKey(5))
        err = None
    except Exception as e:
        df, err = None, str(e)
    out = {"pid": pid, "error": err, "shards_preexisting": claimed_before}
    if df is not None:
        df.to_csv(f"{outfile}.frame.csv", index=False)
        out["n"] = len(df)
    with open(outfile, "w") as f:
        json.dump(out, f)
    print(f"proc {pid}: PREDICT {'FAILOK' if err else 'OK'}", flush=True)


def main():
    pid, nproc, coord, devs, outfile = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
        sys.argv[5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs}")
    # Tests assert on info-level trainer lines (e.g. the broadcast
    # checkpoint-resume step); must be set before utils_log imports.
    os.environ.setdefault("BISCUIT_LOGLEVEL", "INFO")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BISCUIT_JAX_CACHE",
                       os.path.expanduser("~/.cache/biscuit_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from biscuit_tpu.parallel import distributed

    if nproc > 1:
        distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc * devs, jax.device_count()

    if len(sys.argv) > 6 and sys.argv[6] == "e2e":
        _e2e(outfile, sys.argv[7])
        return
    if len(sys.argv) > 6 and sys.argv[6] == "local":
        _local_mesh_mode(outfile, sys.argv[7])
        return
    if len(sys.argv) > 6 and sys.argv[6] == "ladder":
        _distributed_ladder(outfile, sys.argv[7],
                            sys.argv[8] if len(sys.argv) > 8 else 1)
        return
    if len(sys.argv) > 6 and sys.argv[6] == "ladderfail":
        _distributed_ladder_failure(outfile, sys.argv[7])
        return
    if len(sys.argv) > 6 and sys.argv[6] in ("predict", "predictfail"):
        _predict_distributed(outfile, sys.argv[7],
                             fail=sys.argv[6] == "predictfail")
        return
    if len(sys.argv) > 6 and sys.argv[6] == "ckpt":
        kill = sys.argv[9] if len(sys.argv) > 9 else "exit"
        _ckpt_crash_resume(outfile, sys.argv[7], sys.argv[8], kill)
        return

    import numpy as np
    import jax.numpy as jnp

    from biscuit_tpu.hp import ModelParams
    from biscuit_tpu.models.xception import build_model
    from biscuit_tpu.parallel.mesh import (
        batch_sharding,
        data_parallel_mesh,
        replicated,
    )
    from biscuit_tpu.train import trainer

    # SGD, not Adam: the cross-topology comparison needs update math that
    # doesn't amplify f32 reduction-order noise (Adam's g/sqrt(v) is ~sign(g)
    # at step 1, so the ~1e-7 all-reduce ordering jitter between Gloo and
    # intra-process reductions flips near-zero-gradient elements and the
    # trajectories diverge visibly by step 2).
    hp = ModelParams(
        model="xception_tiny", tile_px=32, tile_um=32, batch_size=8,
        epochs=[1], early_stop=False, dropout=0.1, hidden_layer_width=32,
        hidden_layers=1, learning_rate=1e-3, normalizer=None, augment="xy",
        uq=False, optimizer="sgd")
    model = build_model(hp)
    tx = trainer.make_optimizer(hp)
    params, batch_stats = trainer.init_model(model, hp, jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    mesh = data_parallel_mesh()
    rep = replicated(mesh)

    def rep_global(tree):
        # Fully-replicated global arrays from identical per-process host
        # copies (every process computed the same init from the same seed).
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(jax.device_get(x))), tree)

    params, batch_stats, opt_state = map(
        rep_global, (params, batch_stats, opt_state))

    step_fn = jax.jit(
        trainer.make_train_step(model, tx, hp, normalizer=None),
        in_shardings=(rep, rep, rep, batch_sharding(mesh),
                      batch_sharding(mesh), batch_sharding(mesh), rep),
        donate_argnums=(0, 1, 2),
    )

    # Deterministic global batches, identical in every process.
    data_rng = np.random.default_rng(7)
    n_steps, gbs = 2, 8
    g_images = data_rng.integers(
        0, 255, (n_steps, gbs, 32, 32, 3)).astype(np.uint8)
    g_labels = (data_rng.random((n_steps, gbs)) < 0.5).astype(np.int32)
    shard, num_shards = distributed.process_shard()
    assert num_shards == nproc
    rows = gbs // num_shards
    lo, hi = shard * rows, (shard + 1) * rows

    def make_batch(s):
        return distributed.global_batch(
            {"image": g_images[s, lo:hi],
             "label": g_labels[s, lo:hi],
             "mask": np.ones((rows,), np.float32)},
            mesh)

    def rep_key(seed):
        return jax.make_array_from_process_local_data(
            rep, np.asarray(jax.random.PRNGKey(seed)))

    def checksum(tree):
        return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                   for x in jax.tree.leaves(tree))

    # K-pass MC-dropout UQ over the same global mesh (the headline
    # inference path, train/uq.py), reduced to replicated scalars so every
    # process can read and compare them.
    from biscuit_tpu.train.uq import mc_dropout_predict

    def uq_step(p, bs, images, key):
        x = trainer.preprocess(images, None)
        probs, unc = mc_dropout_predict(model, p, bs, x, key, k=4)
        # Class-1 mean (the softmax mean over ALL classes is identically
        # 1/n_classes — useless as a comparison statistic).
        return jnp.mean(probs[:, 1]), jnp.mean(unc)

    uq_fn = jax.jit(uq_step,
                    in_shardings=(rep, rep, batch_sharding(mesh), rep),
                    out_shardings=(rep, rep))
    cks_fn = jax.jit(checksum, out_shardings=rep)

    # AOT-compile every program BEFORE the first cross-process execution,
    # then rendezvous at a coordination-service barrier (gRPC — no XLA
    # collectives involved). On a contended 1-core box the concurrent
    # compiles take minutes and skew the processes; Gloo's first-collective
    # context init only waits ~30 s for its peers, so executing straight
    # out of compile flakes with DEADLINE_EXCEEDED.
    b0 = make_batch(0)
    k0 = rep_key(100)
    step_exe = step_fn.lower(params, batch_stats, opt_state, b0["image"],
                             b0["label"], b0["mask"], k0).compile()
    uq_exe = uq_fn.lower(params, batch_stats, b0["image"], k0).compile()
    cks_exe = cks_fn.lower(params).compile()
    if nproc > 1:
        from jax._src import distributed as _jdist

        _jdist.global_state.client.wait_at_barrier(
            "biscuit_dcn_compiled", 600_000)

    losses, accs, cks_steps = [], [], []
    for s in range(n_steps):
        batch = make_batch(s)
        params, batch_stats, opt_state, metrics = step_exe(
            params, batch_stats, opt_state, batch["image"], batch["label"],
            batch["mask"], rep_key(100 + s))
        losses.append(float(metrics["loss"]))
        accs.append(float(metrics["acc"]))
        cks_steps.append(float(cks_exe(params)))

    cks = cks_steps[-1]
    pm, um = uq_exe(params, batch_stats, make_batch(0)["image"],
                    rep_key(999))

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "losses": losses, "accs": accs,
                   "params_checksum": cks, "cks_steps": cks_steps,
                   "uq_probs_mean": float(pm), "uq_unc_mean": float(um)}, f)
    print(f"proc {pid}/{nproc}: OK", flush=True)


if __name__ == "__main__":
    main()
