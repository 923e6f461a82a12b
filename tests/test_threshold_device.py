"""Device-stats backend parity: threshold.{detect,apply,from_cv} with
backend='device' must match the host path (itself reference-parity-tested
in test_reference_parity.py) to <=1e-6 across the same 20 synthetic
frames, including the exception-parity cases (VERDICT r2 item 1).

The device path runs on the 8-virtual-device CPU backend here; its program
is backend-agnostic JAX (argsorts + segment reductions), so the same
program runs unchanged on the real chip (covered by the -m tpu smoke test).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import biscuit_tpu.threshold as th
from biscuit_tpu.ops import threshold_device

from test_reference_parity import FRAME_SPECS, make_frame

TOL = 1e-6


def _cmp(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
        for k in a:
            _cmp(a[k], b[k], f"{path}.{k}")
    elif a is None or b is None:
        assert a is None and b is None, f"{path}: {a!r} != {b!r}"
    else:
        fa, fb = np.float64(a), np.float64(b)
        same = (fa == fb) | (np.isnan(fa) & np.isnan(fb))
        with np.errstate(invalid="ignore"):
            close = np.abs(fa - fb) <= TOL
        assert np.all(same | close), f"{path}: {a!r} != {b!r}"


def _run_both(fn, *args, **kwargs):
    """Run host and device variants, asserting exception parity; returns
    (host_result, device_result) or (None, None) when both raised."""
    try:
        host = fn(*args, backend="host", **kwargs)
        host_raised = None
    except ValueError as e:
        host_raised = e
    try:
        dev = fn(*args, backend="device", **kwargs)
        dev_raised = None
    except ValueError as e:
        dev_raised = e
    assert (host_raised is None) == (dev_raised is None), (
        f"exception parity: host={host_raised!r} device={dev_raised!r}"
    )
    if host_raised is not None:
        return None, None
    return host, dev


@pytest.mark.parametrize("spec", FRAME_SPECS, ids=lambda s: f"seed{s['seed']}")
def test_detect_device_parity(spec):
    df, patients = make_frame(**spec)
    host, dev = _run_both(th.detect, df.copy(), patients=patients)
    if host is None:
        return
    _cmp(host[0], dev[0], "thresholds")
    _cmp(host[1], dev[1], "auc")


@pytest.mark.parametrize(
    "variant",
    [
        dict(tile_uq=0.2),
        dict(tile_uq=None),
        dict(slide_uq=0.4),  # non-detect slide_uq -> 0.5 quirk
        dict(tile_pred=0.5, slide_pred=0.5),
        dict(tile_uq=0.25, slide_uq=None, slide_pred=0.45),
    ],
    ids=["fixed-tuq", "no-tuq", "fixed-suq", "fixed-preds", "mixed"],
)
@pytest.mark.parametrize("seed", [0, 3, 4], ids=lambda s: f"seed{s}")
def test_detect_device_kwarg_variants(seed, variant):
    spec = next(s for s in FRAME_SPECS if s["seed"] == seed)
    df, patients = make_frame(**spec)
    host, dev = _run_both(th.detect, df.copy(), patients=patients, **variant)
    if host is None:
        return
    _cmp(host[0], dev[0], "thresholds")
    _cmp(host[1], dev[1], "auc")


@pytest.mark.parametrize("level", ["slide", "patient"])
@pytest.mark.parametrize("keep", ["high_confidence", "low_confidence"])
@pytest.mark.parametrize(
    "spec", FRAME_SPECS[:8], ids=lambda s: f"seed{s['seed']}"
)
def test_apply_device_parity(spec, level, keep):
    """detect->apply end-to-end per backend. Thresholds are data values
    (the Youden optimum IS a group score), so the group at the slide-UQ
    boundary is only handled consistently when thresholds are applied on
    the backend that derived them — which is how production runs (one
    backend per run, chosen by env/frame size)."""
    df, patients = make_frame(**spec)
    try:
        thresh_h, _ = th.detect(df.copy(), patients=patients, backend="host")
        thresh_d, _ = th.detect(df.copy(), patients=patients,
                                backend="device")
    except ValueError:
        pytest.skip("degenerate detect frame")
    if thresh_h["tile_uq"] is None:
        pytest.skip("no thresholds detected")
    _cmp(thresh_h, thresh_d, "thresholds")

    def kwargs(t):
        return dict(
            tile_uq=t["tile_uq"], slide_uq=t["slide_uq"],
            tile_pred=t["tile_pred"], slide_pred=t["slide_pred"],
            keep=keep, patients=patients, level=level,
        )

    h_res, h_df = th.apply(df.copy(), backend="host", **kwargs(thresh_h))
    d_res, d_df = th.apply(df.copy(), backend="device", **kwargs(thresh_d))
    _cmp(h_res, d_res, "results")
    if h_df is None:
        assert d_df is None
        return
    assert list(h_df[level]) == list(d_df[level])
    for col in ("y_true", "y_pred", "uncertainty", "error", "y_pred_bin"):
        np.testing.assert_allclose(
            h_df[col].to_numpy(np.float64), d_df[col].to_numpy(np.float64),
            atol=TOL, err_msg=col,
        )


def test_apply_device_zero_thresholds_skip_filters():
    df, patients = make_frame(seed=21)
    h_res, h_df = th.apply(
        df.copy(), tile_uq=0, slide_uq=None, patients=patients,
        backend="host",
    )
    d_res, d_df = th.apply(
        df.copy(), tile_uq=0, slide_uq=None, patients=patients,
        backend="device",
    )
    _cmp(h_res, d_res, "results")
    assert len(h_df) == len(d_df)


def test_apply_device_int_tile_uq_filters_like_host():
    """Host apply() treats any truthy tile_uq as a filter threshold
    (`df[df.uncertainty < tile_uq]`), including ints — the device path
    must not silently skip the filter for non-float numerics."""
    df, patients = make_frame(seed=22)
    # int threshold inside the uncertainty range so the filter matters
    t = int(np.ceil(df["uncertainty"].median() * 100))
    h_res, h_df = th.apply(
        df.copy(), tile_uq=t / 100.0, slide_uq=None, patients=patients,
        backend="host")
    # Same value as a plain python fraction can't be an int; instead use
    # a frame whose uncertainty exceeds 1 for a genuine int threshold.
    df2 = df.assign(uncertainty=df["uncertainty"] * 100.0)
    h2, hdf2 = th.apply(df2.copy(), tile_uq=t, slide_uq=None,
                        patients=patients, backend="host")
    d2, ddf2 = th.apply(df2.copy(), tile_uq=t, slide_uq=None,
                        patients=patients, backend="device")
    _cmp(h2, d2, "int tile_uq results")
    assert len(hdf2) == len(ddf2)


def test_apply_device_detect_string_matches_host_exception():
    """apply(tile_uq='detect') is invalid (detect() is where 'detect'
    lives); the host raises (ValueError from the '{:.5f}' debug format,
    mirroring the reference's log line). The device backend must fall
    back so the SAME exception surfaces, not silently auto-detect a
    threshold."""
    df, patients = make_frame(seed=23)

    def exc_of(backend):
        try:
            th.apply(df.copy(), tile_uq="detect", slide_uq=None,
                     patients=patients, backend=backend)
        except Exception as e:  # noqa: BLE001 - comparing types
            return type(e)
        return None

    host_exc = exc_of("host")
    assert host_exc is not None
    assert exc_of("device") is host_exc


def test_apply_device_detect_tile_pred():
    df, patients = make_frame(seed=2, n_slides=20)
    h_res, _ = th.apply(
        df.copy(), tile_uq=0.3, slide_uq=0.2, tile_pred="detect",
        patients=patients, backend="host",
    )
    d_res, _ = th.apply(
        df.copy(), tile_uq=0.3, slide_uq=0.2, tile_pred="detect",
        patients=patients, backend="device",
    )
    _cmp(h_res, d_res, "results")


def test_from_cv_device_parity():
    folds = [make_frame(seed=s)[0] for s in (30, 31, 32, 33, 34)]
    host = th.from_cv([f.copy() for f in folds], backend="host")
    dev = th.from_cv([f.copy() for f in folds], backend="device")
    _cmp(host, dev, "from_cv")


def test_from_cv_device_parity_with_ties():
    folds = [
        make_frame(seed=s, quantize_pred=1, quantize_uq=2)[0]
        for s in (40, 41, 42)
    ]
    host = th.from_cv([f.copy() for f in folds], backend="host")
    dev = th.from_cv([f.copy() for f in folds], backend="device")
    _cmp(host, dev, "from_cv")


def test_device_backend_fallback_paths():
    """Calls the backend can't serve fall back to host transparently."""
    df, patients = make_frame(seed=0)
    # Single-class tile labels -> HostFallback -> host result.
    degen = df.copy()
    degen["y_true"] = 0
    host = th.detect(degen.copy(), tile_uq=None, slide_uq=None,
                     tile_pred=0.5, slide_pred=0.5, backend="host")
    dev = th.detect(degen.copy(), tile_uq=None, slide_uq=None,
                    tile_pred=0.5, slide_pred=0.5, backend="device")
    _cmp(host[0], dev[0], "thresholds")
    _cmp(host[1], dev[1], "auc")


def test_device_backend_nan_preds_degrade_like_host():
    """detect() with NaN y_pred returns (empty thresholds, None) on BOTH
    backends — the host catches PredsContainNaNError (from_cv relies on
    this to skip bad folds); the device dispatch must not leak it."""
    df, patients = make_frame(seed=1)
    df.loc[3, "y_pred"] = np.nan
    for backend in ("host", "device"):
        thresh, auc = th.detect(df, patients=patients, backend=backend)
        assert auc is None, backend
        assert all(v is None for v in thresh.values()), backend


def test_auto_dispatch_row_threshold(monkeypatch):
    """Auto mode routes big frames to the device backend and small frames
    to host; BISCUIT_DEVICE_STATS forces it."""
    calls = []
    real = threshold_device.detect_device

    def spy(df, **kwargs):
        calls.append(len(df))
        return real(df, **kwargs)

    monkeypatch.setattr(threshold_device, "detect_device", spy)
    monkeypatch.delenv("BISCUIT_DEVICE_STATS", raising=False)
    df, patients = make_frame(seed=0)

    th.detect(df.copy(), patients=patients)           # small -> host
    assert calls == []
    monkeypatch.setenv("BISCUIT_DEVICE_STATS", "1")   # forced -> device
    th.detect(df.copy(), patients=patients)
    assert len(calls) == 1
    monkeypatch.setenv("BISCUIT_DEVICE_STATS", "0")   # forced off
    th.detect(df.copy(), patients=patients)
    assert len(calls) == 1
    monkeypatch.delenv("BISCUIT_DEVICE_STATS")
    monkeypatch.setenv("BISCUIT_DEVICE_STATS_MIN_ROWS", "100")
    th.detect(df.copy(), patients=patients)           # now "big" -> device
    assert len(calls) == 2


def test_program_bucketing_shares_compiles():
    """Folds of similar size hit the same compiled program (rows and
    segments padded to power-of-two buckets) — nested CV must not
    recompile per fold."""
    from biscuit_tpu.ops.threshold_device import _bucket, _prepare

    assert _bucket(300, 1024) == 1024
    assert _bucket(1025, 1024) == 2048
    a, _ = make_frame(seed=50, n_slides=14, tiles_per=25)
    b, _ = make_frame(seed=51, n_slides=12, tiles_per=30)
    pa = _prepare(a, "slide")
    pb = _prepare(b, "slide")
    assert pa[0].shape == pb[0].shape            # same row bucket
    assert pa[-1] == pb[-1]                      # same segment bucket
