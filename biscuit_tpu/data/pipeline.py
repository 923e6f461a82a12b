"""Host-side tile input pipeline: tfrecords -> device-ready uint8 batches.

Replaces the slideflow/tf.data pipeline of the reference stack (SURVEY.md
§2.3 E4). Reads per-slide tfrecords through the index sidecars, decodes
PNG/JPEG tiles (native C++ decoder when built, PIL otherwise), applies
host-side JPEG augmentation ('j' of 'xyrjb'), and yields fixed-shape numpy
batches. Everything downstream (stain norm, flips, standardization, model)
runs on-chip in one XLA program.

For multi-host DCN setups each process constructs the pipeline over its own
shard of slides (``shard``/``num_shards``), the standard
per-process-data + jax.make_array_from_process_local_data recipe.
"""

from __future__ import annotations

import io
import queue
import threading
from os.path import basename, splitext
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from .tfrecord import load_index, read_example_at


def decode_image(raw: bytes) -> np.ndarray:
    """Decode a PNG/JPEG tile to HWC uint8 RGB."""
    try:
        from .native_loader import native_decode

        out = native_decode(raw)
        if out is not None:
            return out
    except Exception:
        pass
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


class TileBatcher:
    """Batched iterator over tile tfrecords with slide-level labels.

    Args:
        tfrecords: per-slide tfrecord paths ({slide}.tfrecords).
        labels: slide -> int label (tiles inherit their slide's label).
        batch_size: fixed batch size; final partial batch is padded and a
            mask marks valid rows (static shapes for XLA).
        shuffle: shuffle the global tile index each epoch.
        infinite: loop forever (training); otherwise one epoch.
        jpeg_aug: host-side random JPEG re-compression probability gate.
    """

    def __init__(
        self,
        tfrecords: List[str],
        labels: Optional[Dict[str, int]] = None,
        batch_size: int = 128,
        shuffle: bool = True,
        infinite: bool = False,
        seed: int = 0,
        jpeg_aug: bool = False,
        shard: int = 0,
        num_shards: int = 1,
        max_tiles: Optional[int] = None,
        tile_px: Optional[int] = None,
        use_native: Optional[bool] = None,
    ):
        self.paths = list(tfrecords)
        self.labels = labels or {}
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.infinite = infinite
        self.jpeg_aug = jpeg_aug
        self.rng = np.random.default_rng(seed)
        self.tile_px = tile_px
        if use_native is None:
            try:
                from .native_loader import available

                use_native = available()
            except Exception:
                use_native = False
        self.use_native = use_native

        entries: List[Tuple[int, int]] = []
        for pi, path in enumerate(self.paths):
            offsets = load_index(path)
            if max_tiles is not None:
                offsets = offsets[:max_tiles]
            entries.extend((pi, int(off)) for off in offsets)
        entries = entries[shard::num_shards]
        self.entries = np.asarray(entries, dtype=np.int64).reshape(-1, 2)
        self._slide_names = [splitext(basename(p))[0] for p in self.paths]
        self._files = {}

    def __len__(self) -> int:
        return len(self.entries)

    @property
    def num_batches(self) -> int:
        return -(-len(self.entries) // self.batch_size)

    def _file(self, pi: int):
        if pi not in self._files:
            self._files[pi] = open(self.paths[pi], "rb")
        return self._files[pi]

    def _read_tile(self, pi: int, offset: int):
        ex = read_example_at(self._file(pi), offset)
        img = decode_image(ex["image_raw"])
        if self.jpeg_aug:
            from .augment import jpeg_augment_host

            img = jpeg_augment_host(img, self.rng)
        slide = (
            ex["slide"].decode()
            if isinstance(ex.get("slide"), bytes)
            else self._slide_names[pi]
        )
        loc_x = ex.get("loc_x", [0])
        loc_y = ex.get("loc_y", [0])
        return img, slide, int(loc_x[0]), int(loc_y[0])

    def _gather_native(self, idx):
        """Threaded C++ read+parse+decode, grouped per source file; falls
        back to the Python path for any tile the native decoder rejects."""
        from .native_loader import native_read_decode_batch

        n = len(idx)
        imgs = np.empty((n, self.tile_px, self.tile_px, 3), np.uint8)
        slides = [""] * n
        locs = np.zeros((n, 2), np.int64)
        by_file: Dict[int, list] = {}
        for row, i in enumerate(idx):
            pi, off = self.entries[i]
            by_file.setdefault(int(pi), []).append((row, int(off)))
        for pi, items in by_file.items():
            rows = [r for r, _ in items]
            offsets = np.asarray([o for _, o in items], np.int64)
            b_imgs, b_slides, b_locs, _labels, _ok = native_read_decode_batch(
                self.paths[pi], offsets, self.tile_px
            )
            for j, row in enumerate(rows):
                if b_locs[j, 0] == -1:  # native decode failed: python path
                    img, slide, lx, ly = self._read_tile(pi, offsets[j])
                    imgs[row] = img
                    slides[row] = slide
                    locs[row] = (lx, ly)
                else:
                    imgs[row] = b_imgs[j]
                    slides[row] = b_slides[j] or self._slide_names[pi]
                    locs[row] = b_locs[j]
        return imgs, slides, locs

    def _gather_python(self, idx):
        imgs, slides, locs = [], [], []
        for i in idx:
            pi, off = self.entries[i]
            img, slide, lx, ly = self._read_tile(pi, off)
            imgs.append(img)
            slides.append(slide)
            locs.append((lx, ly))
        return np.stack(imgs), slides, np.asarray(locs, np.int64)

    def __iter__(self) -> Iterator[dict]:
        if not len(self.entries):
            # An empty infinite stream would otherwise spin forever.
            raise ValueError(
                "TileBatcher has no tiles (empty tfrecord list or all "
                "slides filtered out)"
            )
        while True:
            order = np.arange(len(self.entries))
            if self.shuffle:
                self.rng.shuffle(order)
            for start in range(0, len(order), self.batch_size):
                idx = order[start:start + self.batch_size]
                use_native = (
                    self.use_native
                    and not self.jpeg_aug
                    and self.tile_px is not None
                )
                if use_native:
                    imgs, slides, locs = self._gather_native(idx)
                else:
                    imgs, slides, locs = self._gather_python(idx)
                n_valid = len(idx)
                labels = np.asarray(
                    [self.labels.get(s, -1) for s in slides], np.int32
                )
                if n_valid < self.batch_size:
                    # Pad to a static batch size (mask marks real rows).
                    pad = self.batch_size - n_valid
                    imgs = np.concatenate(
                        [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)]
                    )
                    slides = list(slides) + [""] * pad
                    labels = np.concatenate(
                        [labels, np.full(pad, -1, np.int32)]
                    )
                    locs = np.concatenate([locs, np.zeros((pad, 2), np.int64)])
                yield {
                    "image": imgs,
                    "label": labels,
                    "slide": slides,
                    "loc": locs.astype(np.int32),
                    "mask": np.arange(self.batch_size) < n_valid,
                }
            if not self.infinite:
                return

    def close(self):
        for f in self._files.values():
            f.close()
        self._files.clear()


class PrefetchBatcher:
    """Background-thread prefetch wrapper: decodes the next batches while
    the device computes the current one (keeps the TPU fed — host PNG
    decode is the hot host-side op; see benchmarks/bench_kernels.py).

    Wraps any iterable of batches (normally a TileBatcher). ``depth`` is
    the queue size; 2-3 suffices to hide decode latency behind a train
    step.
    """

    _SENTINEL = object()

    def __init__(self, batcher, depth: int = 3):
        self.batcher = batcher
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: BaseException | None = None

        def worker():
            try:
                for batch in batcher:
                    # put with timeout so a full queue can't deadlock close()
                    # on an infinite batcher.
                    while not self._stop.is_set():
                        try:
                            self._q.put(batch, timeout=0.25)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # re-raised in the consumer
                self._error = e
            finally:
                # The sentinel MUST be delivered (a lost sentinel deadlocks
                # the consumer); retry until it lands or close() is called.
                while not self._stop.is_set():
                    try:
                        self._q.put(self._SENTINEL, timeout=0.25)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._error is not None:
                    # A worker-thread failure must surface, not masquerade
                    # as a clean (truncated) end of stream.
                    raise RuntimeError(
                        "prefetch worker failed"
                    ) from self._error
                return
            yield item

    def __len__(self):
        return len(self.batcher)

    @property
    def num_batches(self):
        return self.batcher.num_batches

    def close(self):
        self._stop.set()
        # Drain so the worker can observe the stop flag and exit.
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._thread.join(timeout=5)
        self.batcher.close()
