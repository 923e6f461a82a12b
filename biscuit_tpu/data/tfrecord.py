"""TFRecord container I/O (no TensorFlow dependency).

Implements the TFRecord on-disk framing — ``uint64le length, uint32le
masked_crc32c(length), payload, uint32le masked_crc32c(payload)`` — so tile
archives written here are byte-compatible with the slideflow/TF stack the
reference uses (SURVEY.md §2.3 E3), and slideflow-written tfrecords load
unchanged.

CRC32C (Castagnoli) runs through the native C++ loader when built
(:mod:`biscuit_tpu.data.native_loader`), falling back to a table-driven
Python implementation. Readers default to ``verify=False`` for speed and a
``.index`` sidecar (record offsets) enables O(1) random access, mirroring
slideflow's index files.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional

import numpy as np

from .proto import decode_example, encode_example

# --- CRC32C -------------------------------------------------------------------

_CRC_TABLE: Optional[np.ndarray] = None


def _crc_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78
        table = np.zeros(256, dtype=np.uint32)
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table[i] = crc
        _CRC_TABLE = table
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    """CRC32C; prefers the native implementation when available."""
    try:
        from .native_loader import native_crc32c

        return native_crc32c(data)
    except Exception:
        pass
    # Pure-Python per-byte table loop (~1 MB/s): correctness fallback only.
    # CRC has a sequential dependency, so numpy cannot vectorize it; the
    # fast path is the native SSE4.2/slicing-by-8 implementation, built via
    # `make -C native`.
    tab = _crc_table().tolist()
    crc_val = 0xFFFFFFFF
    for b in data:
        crc_val = tab[(crc_val ^ b) & 0xFF] ^ (crc_val >> 8)
    return crc_val ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


# --- Writer -------------------------------------------------------------------


class TFRecordWriter:
    """Streaming TFRecord writer with automatic .index sidecar."""

    def __init__(self, path: str, index: bool = True):
        self.path = path
        self._f = open(path, "wb")
        self._offsets: List[int] = []
        self._index = index
        self._pos = 0

    def write(self, payload: bytes) -> None:
        self._offsets.append(self._pos)
        header = struct.pack("<Q", len(payload))
        rec = (
            header
            + struct.pack("<I", masked_crc(header))
            + payload
            + struct.pack("<I", masked_crc(payload))
        )
        self._f.write(rec)
        self._pos += len(rec)

    def write_example(self, features: Dict) -> None:
        self.write(encode_example(features))

    def write_tile(
        self,
        slide: str,
        image_raw: bytes,
        loc_x: Optional[int] = None,
        loc_y: Optional[int] = None,
        label: Optional[int] = None,
    ) -> None:
        """Write a tile in the slideflow feature schema."""
        feats: Dict = {"slide": slide.encode(), "image_raw": image_raw}
        if loc_x is not None:
            feats["loc_x"] = [int(loc_x)]
        if loc_y is not None:
            feats["loc_y"] = [int(loc_y)]
        if label is not None:
            feats["label"] = [int(label)]
        self.write_example(feats)

    def close(self) -> None:
        self._f.close()
        if self._index:
            np.save(self.path + ".index.npy", np.asarray(self._offsets, np.int64))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# --- Reader -------------------------------------------------------------------


def read_records(path: str, verify: bool = False) -> Iterator[bytes]:
    """Iterate raw record payloads."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            (crc_h,) = struct.unpack("<I", f.read(4))
            payload = f.read(length)
            (crc_p,) = struct.unpack("<I", f.read(4))
            if verify:
                if masked_crc(header) != crc_h:
                    raise IOError(f"Corrupt record header in {path}")
                if masked_crc(payload) != crc_p:
                    raise IOError(f"Corrupt record payload in {path}")
            yield payload


def read_examples(path: str, verify: bool = False) -> Iterator[Dict]:
    for payload in read_records(path, verify=verify):
        yield decode_example(payload)


def load_index(path: str) -> np.ndarray:
    """Record byte-offsets for random access; builds sidecar if missing."""
    idx_path = path + ".index.npy"
    if os.path.exists(idx_path):
        return np.load(idx_path)
    offsets = []
    pos = 0
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            offsets.append(pos)
            # Skip header CRC (4) + payload + payload CRC (4).
            f.seek(4 + length + 4, os.SEEK_CUR)
            pos += 8 + 4 + length + 4
    arr = np.asarray(offsets, np.int64)
    try:
        np.save(idx_path, arr)
    except OSError:
        pass
    return arr


def read_example_at(f, offset: int) -> Dict:
    """Read one example from an open file handle at a byte offset."""
    f.seek(offset)
    (length,) = struct.unpack("<Q", f.read(8))
    f.read(4)
    payload = f.read(length)
    return decode_example(payload)


def count_records(path: str) -> int:
    return int(load_index(path).shape[0])
