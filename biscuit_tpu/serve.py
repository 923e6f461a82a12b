"""Serialized AOT servables: one-file deployment artifacts (jax.export).

Reference seam: slideflow serving reconstructs the Python/TF model in
every process (`sf.model.tensorflow.UncertaintyInterface`, used by the
reference's hot loop at /root/reference/results.py:234-257) — serving a
model requires the full training stack importable wherever tiles are
scored. TPU-native redesign: the complete inference program

    uint8 tiles -> stain normalize + standardize -> Xception trunk
    -> K MC-dropout head passes -> (softmax mean, uncertainty)

is traced ONCE, with the trained weights baked in as constants, and
exported to a versioned StableHLO artifact (`jax.export`). Any later
process deserializes and calls it with no biscuit model code, no Flax,
no checkpoint parsing — just `load_servable(path)(tiles)`. The artifact
pins the exact serving numerics at export time (jax.export's guarantee:
compiled-in ops stay loadable across jax releases per its compatibility
window), which removes the skew class where a serving fleet upgrades a
library and silently changes predictions.

Portability vs fusion:

* Default (``use_fused=None``): path selection follows the exporting
  host's backend, same auto-gating as live inference. Exporting ON a
  TPU host bakes the fused Pallas kernels (preprocess / middle flow /
  MC head) as `tpu_custom_call`s — fastest, and Mosaic custom calls are
  on jax.export's stable-compatibility list — but the artifact is
  TPU-only.
* ``use_fused=False`` forces the pure-XLA paths: the artifact is then
  plain StableHLO and can additionally be lowered for several platforms
  at once (``platforms=("tpu", "cpu")``) — one artifact served anywhere,
  at XLA-path speed (the fused kernels are worth ~1.5x on the middle
  flow; see PARITY.md).

The exported program has a static batch (the MXU wants static shapes;
SURVEY.md §6 baselines are batched): ``Servable`` pads the last partial
batch and strips the padding, so callers keep the UncertaintyInterface
contract (any n tiles in, n rows out).

No reference counterpart — deliberate TPU-serving addition (the
reference has no deployment story beyond re-importing the stack).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MAGIC = b"BISCUIT-SERVABLE\n"
# v1: one exported program (the UQ call) fills the whole body.
# v2: the body holds named programs; header["programs"] maps name ->
#     [offset, length] into the body. "uq" is mandatory; "features"
#     (pooled-trunk activations + K-pass head, E9/mosaic) is optional.
# Readers accept both; writers emit v2.
_FORMAT_VERSION = 2
_READABLE_VERSIONS = (1, 2)


def _weights_digest(model_path: str) -> Optional[str]:
    """blake2b of the checkpoint weights (same fingerprint convention as
    int8 calibration persistence — train/uq.py _weights_digest)."""
    p = os.path.join(model_path, "model.msgpack")
    if not os.path.exists(p):
        return None
    h = hashlib.blake2b(digest_size=16)
    with open(p, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def export_servable(
    model_path: str,
    out_path: Optional[str] = None,
    batch_size: int = 64,
    k: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    use_fused: Optional[bool] = None,
    with_features: bool = True,
    features_k: int = 8,
) -> str:
    """Export a saved model dir to a single-file UQ servable.

    Args:
        model_path: trained model directory (params.json + model.msgpack).
        out_path: artifact file (default ``<model_path>/servable.biscuit``).
        batch_size: static batch of the exported program. ``Servable``
            pads/chunks around it; pick the serving sweet spot (1024 on
            v5e for max throughput, smaller for latency).
        k: MC-dropout samples (default: the model's ``hp.uq_samples``).
        platforms: lowering platforms, e.g. ``("tpu",)`` or
            ``("tpu", "cpu")``. Default: the exporting host's backend.
            Any non-TPU platform requires that no fused Pallas kernels
            get baked: pass ``use_fused=False``, or export from a
            non-TPU host with the default auto gate.
        use_fused: bake the fused Pallas kernels (None = auto: fused on
            a TPU exporting host, XLA elsewhere; False = portable pure
            StableHLO; True = require TPU kernels).
        with_features: also export a feature program ``(tiles, key) ->
            (pooled trunk features, probs_mean, uncertainty)`` so UMAP
            mosaics / SlideMaps (E9, reference results.py:269-306) run
            off the artifact alone — ``mosaic.generate_features`` accepts
            the artifact path directly.
        features_k: MC-dropout samples of the feature program's head pass
            (the mosaic labeler needs coarser uncertainty than serving;
            mosaic.generate_features' default).

    Returns the artifact path.
    """
    from .data.normalize import (
        inference_preprocess,
        make_normalizer,
        per_image_standardization,
    )
    from .train.trainer import load_checkpoint
    from .train.uq import mc_dropout_head, mc_dropout_predict, trunk_features

    model, params, batch_stats, hp, _meta = load_checkpoint(model_path)
    k = int(k if k is not None else hp.uq_samples)
    normalizer = make_normalizer(hp.normalizer)
    # Fused Pallas kernels get baked whenever fusion is requested or the
    # auto-gate would pick them (it keys on the exporting host's backend,
    # fused_preprocess.py); any requested non-TPU platform then cannot
    # lower — reject up front with a clear error, including the
    # single-platform case (platforms=("cpu",) on a TPU host).
    bakes_fused = use_fused is True or (
        use_fused is None and jax.default_backend() == "tpu")
    if (platforms is not None and bakes_fused
            and any(p != "tpu" for p in platforms)):
        raise ValueError(
            "exporting for non-TPU platforms requires use_fused=False "
            "(the fused Pallas kernels lower only for TPU); got "
            f"platforms={tuple(platforms)}")
    if use_fused is True and jax.default_backend() != "tpu":
        raise ValueError("use_fused=True requires exporting on a TPU host")
    fused_kw = {}
    if use_fused is not None:
        fused_kw = dict(fused_trunk=use_fused, use_pallas=use_fused)

    def preprocess(images_u8):
        if use_fused is not False:
            # Auto/fused: same gating as live inference (fused Pallas
            # preprocess on a TPU exporting host when applicable).
            return inference_preprocess(images_u8, normalizer)
        # use_fused=False promises a pure-StableHLO artifact — take the
        # exact XLA chain even when exporting on a TPU host (the fused
        # preprocess is a tpu_custom_call too).
        x = images_u8.astype(jnp.float32)
        if normalizer is not None:
            x = normalizer(x)
        return per_image_standardization(x)

    def infer(images_u8, key_data):
        x = preprocess(images_u8)
        key = jax.random.wrap_key_data(key_data)
        return mc_dropout_predict(model, params, batch_stats, x, key, k=k,
                                  **fused_kw)

    key_data = jax.random.key_data(jax.random.PRNGKey(0))
    args = (
        jax.ShapeDtypeStruct((batch_size, hp.tile_px, hp.tile_px, 3),
                             jnp.uint8),
        jax.ShapeDtypeStruct(key_data.shape, key_data.dtype),
    )
    exp_kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jax.export.export(jax.jit(infer), **exp_kw)(*args)
    blobs = {"uq": bytes(exported.serialize())}

    if with_features:
        head_kw = {"use_pallas": use_fused} if use_fused is not None else {}

        def infer_features(images_u8, key_data):
            x = preprocess(images_u8)
            key = jax.random.wrap_key_data(key_data)
            feats = trunk_features(model, params, batch_stats, x,
                                   **({"fused_trunk": use_fused}
                                      if use_fused is not None else {}))
            mean, std = mc_dropout_head(model, params, batch_stats, feats,
                                        key, k=int(features_k), **head_kw)
            return feats, mean, std

        exported_feats = jax.export.export(jax.jit(infer_features),
                                           **exp_kw)(*args)
        blobs["features"] = bytes(exported_feats.serialize())

    header = {
        "format_version": _FORMAT_VERSION,
        "arch": model.arch,
        "tile_px": hp.tile_px,
        "tile_um": hp.tile_um,
        "batch_size": batch_size,
        "k": k,
        "features_k": int(features_k) if with_features else None,
        "normalizer": hp.normalizer,
        "platforms": list(exported.platforms),
        "key_shape": list(key_data.shape),
        "key_dtype": str(key_data.dtype),
        "jax_version": jax.__version__,
        "weights_blake2b": _weights_digest(model_path),
        "fused": use_fused,
        # Training-time class order (Dataset.labels convention), when the
        # checkpoint recorded it — lets predict-time label derivation be
        # validated against the order the head was trained with
        # (cli/predict.py) instead of silently remapped.
        "outcome_labels": _meta.get("outcome_labels"),
    }
    programs, checksums, off = {}, {}, 0
    for name, blob in blobs.items():
        programs[name] = [off, len(blob)]
        checksums[name] = hashlib.blake2b(blob, digest_size=16).hexdigest()
        off += len(blob)
    header["programs"] = programs
    # Per-program body digests, verified at load: a truncated or bit-rotted
    # artifact fails with "artifact corrupt, re-export" instead of an opaque
    # jax.export.deserialize error. Additive within format v2 — older
    # readers ignore the field, older artifacts skip verification.
    header["checksums"] = checksums
    if out_path is None:
        out_path = os.path.join(model_path, "servable.biscuit")
    hdr = json.dumps(header).encode()
    tmp = f"{out_path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr)
            for blob in blobs.values():
                f.write(blob)
        os.replace(tmp, out_path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return out_path


def is_servable_artifact(path: str) -> bool:
    """True if ``path`` is a servable container. Sniffs the magic bytes —
    artifacts may carry any filename (cli/export.py ``-o``), so dispatching
    on a ``.biscuit`` suffix is not reliable."""
    if not os.path.isfile(path):
        return False
    try:
        with open(path, "rb") as f:
            return f.read(len(_MAGIC)) == _MAGIC
    except OSError:
        return False


def _read_container(path: str) -> Tuple[dict, dict]:
    """Returns (header, {program_name: serialized_blob}). v1 bodies are a
    single unnamed UQ program; v2 bodies are indexed by header['programs']."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a biscuit servable "
                             f"(bad magic {magic!r})")
        n = int.from_bytes(f.read(8), "little")
        if n <= 0 or n > (1 << 20):
            raise ValueError(f"{path}: implausible header length {n}")
        header = json.loads(f.read(n))
        version = header.get("format_version")
        if version not in _READABLE_VERSIONS:
            raise ValueError(
                f"{path}: servable format {version} not supported "
                f"(this build reads {_READABLE_VERSIONS})")
        body = f.read()
    if version == 1:
        return header, {"uq": body}
    index = header.get("programs") or {}
    if "uq" not in index:
        raise ValueError(f"{path}: v2 servable missing the 'uq' program")
    programs = {}
    checksums = header.get("checksums") or {}
    for name, (off, length) in index.items():
        if off < 0 or off + length > len(body):
            raise ValueError(
                f"{path}: program {name!r} spans [{off}, {off + length}) "
                f"outside the {len(body)}-byte body — artifact truncated "
                "or corrupt; re-export the servable")
        blob = body[off:off + length]
        want = checksums.get(name)
        if want is not None:
            got = hashlib.blake2b(blob, digest_size=16).hexdigest()
            if got != want:
                raise ValueError(
                    f"{path}: program {name!r} checksum mismatch "
                    f"({got} != {want}) — artifact corrupt; re-export "
                    "the servable")
        programs[name] = blob
    return header, programs


def _unpack_header(obj, header: dict) -> None:
    """Shared Servable/ShardedServable header attributes."""
    obj.header = header
    obj.batch_size = int(header["batch_size"])
    obj.tile_px = int(header["tile_px"])
    # .get: tile_um joined the header after the first exports; older
    # artifacts fall back to the caller supplying it (predict_slides).
    obj.tile_um = header.get("tile_um")
    obj.k = int(header["k"])
    fk = header.get("features_k")
    obj.features_k = int(fk) if fk is not None else None
    obj._key = jax.random.PRNGKey(0)


def _chunked_call(call_exact, step: int, tiles, key):
    """Any-n driver over a static-batch exact program: zero-pad each
    partial chunk to ``step``, strip the padding rows. Shared by
    ``Servable``/``ShardedServable`` ``__call__``/``features`` so the
    padding contract lives in exactly one place. ``n == 0`` still
    dispatches one all-padding batch (compile-cached) so outputs carry
    their real trailing dimensions — (0, C) out, keeping the any-n
    contract. Works for any tuple-arity exact program ((mean, std) for
    the UQ call; (feats, mean, std) for the feature call)."""
    tiles = np.asarray(tiles)
    if tiles.ndim == 3:
        tiles = tiles[None]
    n = tiles.shape[0]
    outs = None
    for i in range(0, max(n, 1), step):
        chunk = tiles[i:i + step]
        n_real = chunk.shape[0]
        if n_real < step:
            chunk = np.concatenate(
                [chunk, np.zeros((step - n_real,) + tuple(chunk.shape[1:]),
                                 chunk.dtype)], axis=0)
        # Distinct internal keys per chunk; an explicit key is the caller
        # pinning determinism and applies to every chunk.
        res = call_exact(chunk, key=key)
        res = res if isinstance(res, (tuple, list)) else (res,)
        if outs is None:
            outs = [[] for _ in res]
        for acc, r in zip(outs, res):
            acc.append(np.asarray(r)[:n_real])
    return tuple(np.concatenate(acc, axis=0) for acc in outs)


class Servable:
    """A deserialized UQ servable: ``(tiles) -> (probs_mean, uncertainty)``.

    Keeps the ``UncertaintyInterface.__call__`` contract (any-n uint8 RGB
    tile batch in, n rows out; internal key stream unless ``key=`` is
    passed) over the exported static-batch program: partial batches are
    zero-padded and the padding rows stripped. Use ``call_exact`` to skip
    the padding layer when the caller already batches at the exported
    size (the bench/serving hot loop).
    """

    def __init__(self, path: str):
        header, programs = _read_container(path)
        _unpack_header(self, header)
        self._programs = programs
        self._exported = jax.export.deserialize(bytearray(programs["uq"]))
        self._call = jax.jit(self._exported.call)
        self._features_call = None  # lazily deserialized

    @property
    def platforms(self):
        return tuple(self.header["platforms"])

    @property
    def has_features(self) -> bool:
        """True if the artifact carries the feature program (exported with
        ``with_features=True``) — required by ``features``/``features_exact``
        and by ``mosaic.generate_features`` over an artifact."""
        return "features" in self._programs

    def _next_key_data(self, key):
        if key is None:
            self._key, key = jax.random.split(self._key)
        return jax.random.key_data(key)

    def call_exact(self, tiles, key=None):
        """Exact exported program: tiles must be (batch_size, px, px, 3)."""
        return self._call(self._check_exact(tiles), self._next_key_data(key))

    def _check_exact(self, tiles):
        tiles = jnp.asarray(tiles, jnp.uint8)
        want = (self.batch_size, self.tile_px, self.tile_px, 3)
        if tuple(tiles.shape) != want:
            raise ValueError(
                f"servable expects tiles of shape {want}, got "
                f"{tuple(tiles.shape)}; use __call__ for any-n batches")
        return tiles

    def __call__(self, tiles, key=None):
        return _chunked_call(self.call_exact, self.batch_size, tiles, key)

    def features_exact(self, tiles, key=None):
        """Exact feature program: ``(batch_size, px, px, 3) uint8 ->
        (pooled trunk features, probs_mean, uncertainty)``."""
        if not self.has_features:
            raise ValueError(
                "this artifact was exported without the feature program; "
                "re-export with export_servable(..., with_features=True)")
        if self._features_call is None:
            self._features_call = jax.jit(jax.export.deserialize(
                bytearray(self._programs["features"])).call)
        return self._features_call(self._check_exact(tiles),
                                   self._next_key_data(key))

    def features(self, tiles, key=None):
        """Any-n feature extraction off the artifact alone (E9): returns
        ``(feats (n, F), probs_mean (n, C), uncertainty (n, C))``."""
        return _chunked_call(self.features_exact, self.batch_size, tiles,
                             key)


def load_servable(path: str) -> Servable:
    """Load a servable exported by :func:`export_servable`."""
    return Servable(path)


class ShardedServable:
    """Data-parallel fan-out of a servable over a ``jax.sharding.Mesh``.

    One single-device artifact (static per-device batch ``B``) serves
    ``B x n_devices`` tiles per dispatch: the global batch is sharded over
    the mesh's leading axis and the exported program becomes the
    ``jax.shard_map`` body, running SPMD on every device. The program
    contains no collectives — the only cross-device traffic is the
    host->device scatter of the input batch — so serving scales linearly
    over ICI, and the same artifact file deploys unchanged from one chip
    to a full slice (no re-export per topology, unlike baking a mesh into
    the exported program, which pins nr_devices at export time).

    Per-shard dropout keys are ``fold_in(key, shard_index)``, so shards
    draw independent MC-dropout mask streams; passing ``key=`` pins the
    whole global batch deterministically.

    Reference seam: the reference's serving loop
    (/root/reference/results.py:234-257) is one GPU per process; scaling
    means more processes each re-importing the stack. Here one process
    drives the whole slice.
    """

    def __init__(self, path: str, mesh=None, axis: str = "data"):
        header, programs = _read_container(path)
        _unpack_header(self, header)  # batch_size is per device
        self._programs = programs
        self._exported = jax.export.deserialize(bytearray(programs["uq"]))
        if mesh is None:
            from .parallel.mesh import data_parallel_mesh

            mesh = data_parallel_mesh(axis=axis)
        self.mesh = mesh
        self.axis = axis
        self.n_shards = int(mesh.shape[axis])
        self.global_batch = self.batch_size * self.n_shards
        self._call = self._shard_mapped(self._exported.call)
        self._features_call = None  # lazily deserialized + shard-mapped

    def _shard_mapped(self, call):
        """jit(shard_map) wrapper fanning an exported per-device program
        over the mesh: each shard gets its (batch_size, ...) slice of the
        global batch and its own folded key."""
        import jax.sharding as jsh

        P = jsh.PartitionSpec

        def body(tiles_local, kd_local):
            # tiles_local: (batch_size, px, px, 3) — this shard's slice of
            # the global batch. kd_local: (1, *key_shape) — this shard's
            # folded key.
            return call(tiles_local, kd_local[0])

        return jax.jit(jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis)),
            out_specs=P(self.axis),
        ))

    @property
    def platforms(self):
        return tuple(self.header["platforms"])

    @property
    def has_features(self) -> bool:
        return "features" in self._programs

    def _shard_key_data(self, key):
        if key is None:
            self._key, key = jax.random.split(self._key)
        return jnp.stack([
            jax.random.key_data(jax.random.fold_in(key, i))
            for i in range(self.n_shards)
        ])

    def call_exact(self, tiles, key=None):
        """Exact sharded program: tiles must be (global_batch, px, px, 3)."""
        return self._call(self._check_exact(tiles),
                          self._shard_key_data(key))

    def _check_exact(self, tiles):
        tiles = jnp.asarray(tiles, jnp.uint8)
        want = (self.global_batch, self.tile_px, self.tile_px, 3)
        if tuple(tiles.shape) != want:
            raise ValueError(
                f"sharded servable expects tiles of shape {want} "
                f"({self.n_shards} shards x batch {self.batch_size}), got "
                f"{tuple(tiles.shape)}; use __call__ for any-n batches")
        return tiles

    def __call__(self, tiles, key=None):
        return _chunked_call(self.call_exact, self.global_batch, tiles, key)

    def features_exact(self, tiles, key=None):
        """Exact sharded feature program: (global_batch, px, px, 3) ->
        (feats, probs_mean, uncertainty), each sharded over the mesh."""
        if not self.has_features:
            raise ValueError(
                "this artifact was exported without the feature program; "
                "re-export with export_servable(..., with_features=True)")
        if self._features_call is None:
            self._features_call = self._shard_mapped(jax.export.deserialize(
                bytearray(self._programs["features"])).call)
        return self._features_call(self._check_exact(tiles),
                                   self._shard_key_data(key))

    def features(self, tiles, key=None):
        """Any-n sharded feature extraction: (feats, probs_mean, unc)."""
        return _chunked_call(self.features_exact, self.global_batch, tiles,
                             key)


def load_sharded_servable(path: str, mesh=None,
                          axis: str = "data") -> ShardedServable:
    """Load a servable and fan it out data-parallel over ``mesh``
    (default: a 1-D mesh over all local devices)."""
    return ShardedServable(path, mesh=mesh, axis=axis)


def predict_tfrecords(servable, tfrecords, labels=None, outcome="cohort",
                      max_tiles=None, key=None):
    """Score tile tfrecords with a (sharded) servable -> tile predictions
    DataFrame in the reference on-disk contract (slide, loc_x, loc_y,
    ``{outcome}_y_true0``, ``{outcome}_y_pred{i}``,
    ``{outcome}_uncertainty{i}`` — reference experiment.py:694-698).

    The serving-side twin of ``trainer.predict_tiles``: same columns, same
    prefetch-fed native batch reader, but driven through an exported
    artifact — no Flax, no checkpoint parsing, no model code. Accepts a
    :class:`Servable` or a :class:`ShardedServable` (the latter scores
    ``batch_size x n_devices`` tiles per dispatch across the mesh).

    Args:
        servable: a loaded servable (``load_servable`` /
            ``load_sharded_servable``).
        tfrecords: per-slide ``{slide}.tfrecords`` paths.
        labels: optional slide -> int label map; unknown slides get -1 in
            ``{outcome}_y_true0`` (the contract tolerates unlabeled tiles).
        outcome: outcome name for the column prefix.
        max_tiles: per-tfrecord cap (reference ``max_tiles`` semantics).
        key: optional PRNG key pinning the MC-dropout streams; default is
            the servable's internal advancing key stream.
    """
    from .data.pipeline import PrefetchBatcher, TileBatcher
    from .utils import scored_tile_rows, tile_predictions_frame

    step = int(getattr(servable, "global_batch", servable.batch_size))
    batcher = PrefetchBatcher(
        TileBatcher(
            list(tfrecords), labels or {}, batch_size=step, shuffle=False,
            infinite=False, max_tiles=max_tiles, tile_px=servable.tile_px,
        ),
        depth=3,
    )
    key_state = [key]

    def score(batch):
        if key_state[0] is not None:
            key_state[0], sub = jax.random.split(key_state[0])
        else:
            sub = None
        # TileBatcher pads the final partial batch to the static step
        # size, so the exact exported program runs every time; the row
        # assembly strips padding via the mask.
        return servable.call_exact(batch["image"], key=sub)

    try:
        df, probs, unc = scored_tile_rows(batcher, score)
    finally:
        batcher.close()
    return tile_predictions_frame(outcome, df, probs, unc)


def predict_tfrecords_distributed(servable, tfrecords, workdir, labels=None,
                                  outcome="cohort", max_tiles=None,
                                  key=None, timeout_ms=600_000):
    """Fleet batch scoring over a multi-process JAX runtime — the serving
    twin of Experiment.run's distributed fold scheduling (SURVEY.md §2.5;
    no reference counterpart: the reference scores with one GPU process,
    /root/reference/results.py:234-257).

    Every process calls this with the SAME tfrecord list (claim tokens
    and output ordering key on the list index). Each host atomically
    claims whole per-slide tfrecords from the coordination-service work
    queue (``parallel.distributed.try_claim`` — the primitive behind
    distributed fold scheduling), scores its claims locally through its
    own servable, and writes one shard file into ``workdir`` (a SHARED
    filesystem path, like the ladder's artifact tree). A status exchange
    closes the scoring phase — one host's failure aborts scoring on
    EVERY host instead of hanging the fleet at the merge barrier — then
    every process reads all shards and returns the SAME merged
    tile-prediction frame, ordered by the input list order (which host
    claimed what does not leak into the output).

    Determinism: with ``key=`` given, tfrecord ``i`` is scored with
    ``fold_in(key, i)`` regardless of the claiming host, so the merged
    frame is identical at any fleet size (pinned in test_distributed).

    Single-process this degrades to :func:`predict_tfrecords` semantics:
    every claim is won locally and the merge reads back the one shard.
    """
    from .data.tfrecord import load_index

    def score_one(i, p, sub):
        if len(load_index(p)) == 0:
            # A QC'd-empty tfrecord contributes no rows — same as it
            # would inside the combined non-distributed batcher (scored
            # alone it would raise TileBatcher's no-tiles error and abort
            # the whole fleet).
            return None
        return predict_tfrecords(servable, [p], labels=labels,
                                 outcome=outcome, max_tiles=max_tiles,
                                 key=sub)

    return _distributed_claim_map(servable, tfrecords, workdir, score_one,
                                  outcome, key, timeout_ms)


def _distributed_claim_map(servable, items, workdir, score_one, outcome,
                           key, timeout_ms):
    """Generic claim/score/merge driver behind ``predict_*_distributed``:
    item ``i`` is claimed atomically across the process group, scored
    locally via ``score_one(i, item, fold_in(key, i))`` (None = item
    contributes no rows), shards exchange through the shared ``workdir``,
    a status exchange aborts every host when one fails, and all hosts
    return the identical merged frame ordered by the input list."""
    import uuid

    import pandas as pd

    from .parallel import distributed as dist
    from .utils import tile_predictions_frame

    mesh = getattr(servable, "mesh", None)
    if mesh is not None and dist.mesh_spans_processes(mesh):
        raise ValueError(
            "distributed scoring runs per-host independent claims; a "
            "ShardedServable here must fan out over THIS host's devices "
            "only (a process-spanning mesh makes the scoring program a "
            "fleet-collective that deadlocks against the claim schedule) "
            "— build it with load_sharded_servable(path, "
            "mesh=data_parallel_mesh(jax.local_devices()))")
    items = [str(p) for p in items]
    os.makedirs(workdir, exist_ok=True)
    # Claim tokens are namespaced per invocation (same rationale as
    # Experiment.run): coordination-service counters outlive one call, and
    # a stale claim from an earlier run in the same process group must not
    # starve this one. The namespace also keys the shard filenames, so a
    # reused workdir cannot leak stale shards into the merge.
    ns = dist.broadcast_from_main(
        "predict_nonce",
        uuid.uuid4().hex[:12] if dist.is_main() else None,
        timeout_ms=timeout_ms)
    pid = jax.process_index()

    err = None
    wrote_shard = False
    try:
        frames = []
        for i, p in enumerate(items):
            if not dist.try_claim(f"{ns}_item{i}"):
                continue
            sub = jax.random.fold_in(key, i) if key is not None else None
            df = score_one(i, p, sub)
            if df is None:
                continue
            df.insert(0, "_src", i)
            frames.append(df)
        if frames:
            shard = pd.concat(frames, ignore_index=True)
            tmp = os.path.join(workdir, f".{ns}_shard_{pid}.tmp")
            shard.to_parquet(tmp)
            os.replace(tmp, os.path.join(workdir, f"{ns}_shard_{pid}.parquet"))
            wrote_shard = True
    except Exception as e:
        err = e
    all_ok = dist.exchange_ok(f"{ns}_scored", err is None, timeout_ms)
    if err is not None:
        raise err
    if not all_ok:
        raise RuntimeError("a peer host failed distributed scoring")
    # Every host reports whether it wrote a shard; the glob below must see
    # exactly that many files. On a real shared filesystem (NFS attribute
    # caching) a just-renamed peer shard can be invisible to the first
    # listing — silently dropping that host's rows would break the
    # identical-merged-frame guarantee, so poll until the count matches.
    n_expect = sum(int(v) for v in dist.exchange_values(
        f"{ns}_wrote", "1" if wrote_shard else "0", timeout_ms))

    import time as _time
    from glob import glob

    pattern = os.path.join(workdir, f"{ns}_shard_*.parquet")
    deadline = _time.monotonic() + 30.0
    shards = sorted(glob(pattern))
    while len(shards) < n_expect and _time.monotonic() < deadline:
        _time.sleep(0.2)
        shards = sorted(glob(pattern))
    if len(shards) != n_expect:
        raise RuntimeError(
            f"distributed scoring merge expected {n_expect} shard files "
            f"under {workdir} but sees {len(shards)} — shared-filesystem "
            "propagation failed (is workdir actually shared across "
            "hosts?)")
    if not shards:
        empty = pd.DataFrame({"slide": [], "loc_x": [], "loc_y": [],
                              "y_true": []})
        return tile_predictions_frame(outcome, empty,
                                      np.zeros((0, 2), np.float32), None)
    merged = pd.concat([pd.read_parquet(s) for s in shards],
                       ignore_index=True)
    merged = merged.sort_values("_src", kind="stable").drop(columns="_src")
    return merged.reset_index(drop=True)


def predict_slides(servable, slides, tile_um=None, mpp=None, qc="both",
                   stride_div=1, roi_method="ignore", outcome="cohort",
                   max_tiles=None, key=None):
    """Score whole-slide images DIRECTLY with a (sharded) servable — no
    extraction step, no tfrecords: the reference's per-tile UQ inference
    loop (/root/reference/results.py:234-257: sf.WSI -> build_generator ->
    UncertaintyInterface per tile) as a deployment path. Returns the same
    tile-prediction frame as :func:`predict_tfrecords` with grid (i, j)
    in loc_x/loc_y and ``y_true0 = -1`` (slides carry no labels).

    Args:
        slides: WSI paths (.svs/.tif via the native tiled reader, or any
            PIL-readable image).
        tile_um: tile size in microns (default: the artifact's — exports
            record it; required for pre-tile_um artifacts).
        mpp: microns per pixel override for containers without metadata
            (plain PNG/JPEG slides).
        qc: 'both' (Otsu + blur, the reference extraction default),
            'otsu', 'blur', or None.
        stride_div: grid stride divisor (sf.Heatmap's knob).
        max_tiles: per-slide tile cap (grid order) — the slide-mode twin
            of predict_tfrecords' per-tfrecord cap.
    """
    import pandas as pd

    from .data.slide import WSI
    from .utils import tile_predictions_frame

    tile_um = tile_um if tile_um is not None else servable.tile_um
    if tile_um is None:
        raise ValueError(
            "this artifact predates tile_um in the servable header; pass "
            "tile_um= explicitly")
    step = int(getattr(servable, "global_batch", servable.batch_size))
    rows = {"slide": [], "loc_x": [], "loc_y": [], "y_true": []}
    probs_all, unc_all = [], []

    def flush(imgs, locs, slide_name):
        nonlocal key
        n_real = len(imgs)
        if not n_real:
            return
        if key is not None:
            key, sub = jax.random.split(key)
        else:
            sub = None
        # servable.__call__ pads the (single, <= step) chunk to the static
        # batch and strips the padding rows.
        m_probs, m_unc = servable(np.stack(imgs), key=sub)
        probs_all.append(np.asarray(m_probs))
        unc_all.append(np.asarray(m_unc))
        for i in range(n_real):
            rows["slide"].append(slide_name)
            rows["loc_x"].append(int(locs[i][0]))
            rows["loc_y"].append(int(locs[i][1]))
            rows["y_true"].append(-1)

    for path in slides:
        wsi = WSI(path, tile_px=servable.tile_px, tile_um=tile_um, mpp=mpp,
                  qc=qc, stride_div=stride_div, roi_method=roi_method)
        imgs, locs, taken = [], [], 0
        for item in wsi.build_generator(shuffle=False, include_loc="grid")():
            if max_tiles is not None and taken >= max_tiles:
                break
            taken += 1
            imgs.append(item["image"])
            locs.append(item["loc"])
            if len(imgs) == step:
                flush(imgs, locs, wsi.name)
                imgs, locs = [], []
        flush(imgs, locs, wsi.name)

    probs = (np.concatenate(probs_all) if probs_all
             else np.zeros((0, 2), np.float32))
    unc = np.concatenate(unc_all) if unc_all else None
    return tile_predictions_frame(outcome, pd.DataFrame(rows), probs, unc)


def predict_slides_distributed(servable, slides, workdir, tile_um=None,
                               mpp=None, qc="both", stride_div=1,
                               roi_method="ignore", outcome="cohort",
                               max_tiles=None, key=None,
                               timeout_ms=600_000):
    """Fleet scoring of whole-slide images: the :func:`predict_slides`
    loop distributed across a multi-process runtime with the same
    claim/merge/abort protocol as :func:`predict_tfrecords_distributed`
    (one claim per slide — extraction-free WSI scoring is the heaviest
    per-item work in the serving stack, so slides are the natural work
    unit). Every host returns the identical merged frame, ordered by the
    input slide list and bitwise independent of fleet size (slide ``i``
    is always scored with ``fold_in(key, i)``)."""

    def score_one(i, path, sub):
        return predict_slides(servable, [path], tile_um=tile_um, mpp=mpp,
                              qc=qc, stride_div=stride_div,
                              roi_method=roi_method, outcome=outcome,
                              max_tiles=max_tiles, key=sub)

    return _distributed_claim_map(servable, slides, workdir, score_one,
                                  outcome, key, timeout_ms)
