"""Aperio JPEG2000 (.svs compression 33003/33005) decode (VERDICT r2
item 3).

Real TCGA/CPTAC slides are tiled TIFFs whose tiles are raw JPEG2000
codestreams — stock libtiff cannot decode them and PIL cannot even OPEN
such containers. The native library dlopens libopenjp2 and routes raw
tile reads through bn_j2k_decode. Fixtures are hand-assembled tiled
TIFFs (classic little-endian layout written by _build_tiff below) whose
tile payloads are lossless PIL-encoded JPEG2000 — PIL is the independent
encoder, so byte-exact native reads validate the whole chain.
"""

from __future__ import annotations

import ctypes
import io
import struct

import numpy as np
import pytest
from PIL import Image

from biscuit_tpu.data.native_loader import TiledTiff, _load


def _lib():
    lib = _load()
    lib.bn_j2k_available.restype = ctypes.c_int32
    lib.bn_j2k_decode.restype = ctypes.c_int
    lib.bn_j2k_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    return lib


pytestmark = pytest.mark.skipif(
    not _lib().bn_j2k_available(), reason="libopenjp2 not present"
)


def _encode_j2k(arr, raw_codestream=False, tmp_path=None):
    """Lossless JPEG2000 via PIL (independent encoder). JP2 box by
    default; raw .j2k codestream (the Aperio layout) via a suffixed
    temp file."""
    img = Image.fromarray(arr)
    if raw_codestream:
        p = tmp_path / "t.j2k"
        img.save(str(p), irreversible=False)
        return p.read_bytes()
    buf = io.BytesIO()
    img.save(buf, format="JPEG2000", irreversible=False)
    return buf.getvalue()


def _decode_native(data, w, h, ycbcr=0):
    lib = _lib()
    out = np.zeros((h, w, 3), np.uint8)
    ow = ctypes.c_int64()
    oh = ctypes.c_int64()
    rc = lib.bn_j2k_decode(
        data, ctypes.c_int64(len(data)),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(out.nbytes),
        ctypes.byref(ow), ctypes.byref(oh), ctypes.c_int32(ycbcr))
    return rc, out, ow.value, oh.value


def _build_tiff(path, W, H, tile, payloads, compression, photometric,
                desc=None):
    """Minimal classic (II, 42) tiled TIFF with pre-compressed tile
    payloads — libtiff cannot ENCODE compression 33003/33005, so the
    container is assembled by hand."""
    out = io.BytesIO()
    out.write(b"II*\x00")
    out.write(struct.pack("<I", 0))
    offsets = []
    for p in payloads:
        offsets.append(out.tell())
        out.write(p)
        if out.tell() % 2:
            out.write(b"\x00")
    n = len(payloads)
    bps_off = out.tell()
    out.write(struct.pack("<3H", 8, 8, 8))
    desc_off = None
    if desc:
        d = desc.encode() + b"\x00"
        desc_off = out.tell()
        out.write(d)
        if out.tell() % 2:
            out.write(b"\x00")
    off_off = out.tell()
    out.write(struct.pack("<%dI" % n, *offsets))
    cnt_off = out.tell()
    out.write(struct.pack("<%dI" % n, *[len(p) for p in payloads]))
    ifd_off = out.tell()
    entries = [
        (256, 3, 1, W), (257, 3, 1, H), (258, 3, 3, bps_off),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (277, 3, 1, 3), (284, 3, 1, 1),
        (322, 3, 1, tile), (323, 3, 1, tile),
        (324, 4, n, offsets[0] if n == 1 else off_off),
        (325, 4, n, len(payloads[0]) if n == 1 else cnt_off),
    ]
    if desc:
        entries.append((270, 2, len(desc) + 1, desc_off))
    entries.sort()
    out.write(struct.pack("<H", len(entries)))
    for tag, typ, cnt, val in entries:
        out.write(struct.pack("<HHII", tag, typ, cnt, val))
    out.write(struct.pack("<I", 0))
    data = bytearray(out.getvalue())
    struct.pack_into("<I", data, 4, ifd_off)
    path.write_bytes(bytes(data))


def _tile_payloads(img, tile, encode):
    H, W, _ = img.shape
    pays = []
    for ty in range(0, H, tile):
        for tx in range(0, W, tile):
            t = np.zeros((tile, tile, 3), np.uint8)
            sub = img[ty:ty + tile, tx:tx + tile]
            t[:sub.shape[0], :sub.shape[1]] = sub
            pays.append(encode(t))
    return pays


def _rgb_to_ycbcr_jpeg(rgb):
    """JPEG full-range RGB->YCbCr in float, rounded to uint8 — the
    transform Aperio's 33003 tiles store."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(np.stack([y, cb, cr], -1) + 0.5, 0, 255).astype(np.uint8)


class TestJ2KDecode:
    def test_jp2_box_byte_exact(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
        rc, out, w, h = _decode_native(_encode_j2k(img), 56, 40)
        assert rc == 0 and (w, h) == (56, 40)
        np.testing.assert_array_equal(out, img)

    def test_raw_codestream_byte_exact(self, tmp_path):
        """Aperio tiles are raw J2K codestreams (SOC marker ff4f), not
        JP2 boxes."""
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        data = _encode_j2k(img, raw_codestream=True, tmp_path=tmp_path)
        assert data[:2] == b"\xff\x4f"
        rc, out, w, h = _decode_native(data, 32, 32)
        assert rc == 0
        np.testing.assert_array_equal(out, img)

    def test_garbage_rejected(self):
        rc, *_ = _decode_native(b"\xff\x4f" + b"\x00" * 100, 8, 8)
        assert rc != 0

    def test_truncated_rejected(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        data = _encode_j2k(img)[: 40]
        rc, *_ = _decode_native(data, 16, 16)
        assert rc != 0


class TestJ2KTiff:
    def test_33005_rgb_byte_exact(self, tmp_path):
        """Compression 33005 (J2K RGB): whole-region and partial reads
        are byte-correct vs the pre-encoding pixels (lossless 5/3)."""
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
        path = tmp_path / "a.svs"
        _build_tiff(path, 80, 96, 32,
                    _tile_payloads(img, 32, _encode_j2k), 33005, 2)
        t = TiledTiff(str(path))
        assert (t.width, t.height) == (80, 96)
        np.testing.assert_array_equal(t.read_region(0, 0, 80, 96), img)
        # Partial region crossing tile boundaries
        np.testing.assert_array_equal(
            t.read_region(17, 25, 40, 50), img[25:75, 17:57])
        # Out-of-image area zero-filled
        edge = t.read_region(64, 80, 32, 32)
        np.testing.assert_array_equal(edge[:16, :16], img[80:, 64:])
        assert (edge[16:] == 0).all() and (edge[:, 16:] == 0).all()
        t.close()

    def test_33003_ycbcr_close(self, tmp_path):
        """Compression 33003 stores YCbCr planes; the native decode
        applies the JPEG full-range inverse transform. Round-trip error
        is bounded by the uint8 quantization of the forward transform."""
        rng = np.random.default_rng(4)
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ycc = _rgb_to_ycbcr_jpeg(img)
        path = tmp_path / "b.svs"
        _build_tiff(path, 64, 64, 32,
                    _tile_payloads(ycc, 32, _encode_j2k), 33003, 6)
        t = TiledTiff(str(path))
        out = t.read_region(0, 0, 64, 64)
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.max() <= 3, diff.max()
        t.close()

    def test_corrupt_tile_raises(self, tmp_path):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        pays = [b"\xff\x4fgarbage-not-a-codestream" + b"\x00" * 64]
        path = tmp_path / "c.svs"
        _build_tiff(path, 32, 32, 32, pays, 33005, 2)
        t = TiledTiff(str(path))
        with pytest.raises(OSError):
            t.read_region(0, 0, 32, 32)
        t.close()


class TestJ2KWSI:
    def test_wsi_extraction_without_pil(self, tmp_path):
        """PIL cannot open J2K .svs containers at all; WSI must run on
        the native reader alone — metadata (Aperio MPP) via
        bn_tiff_description, pixels via the OpenJPEG tile path."""
        from biscuit_tpu.data.slide import WSI

        rng = np.random.default_rng(6)
        img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
        path = tmp_path / "d.svs"
        _build_tiff(path, 128, 128, 32,
                    _tile_payloads(img, 32, _encode_j2k), 33005, 2,
                    desc="Aperio Fake\n|AppMag = 20|MPP = 0.4942|")
        with pytest.raises(Exception):
            Image.open(str(path)).load()

        wsi = WSI(str(path), tile_px=32, tile_um=16)
        assert wsi._img is None and wsi._tiled is not None
        assert (wsi.width, wsi.height) == (128, 128)
        assert abs(wsi.mpp - 0.4942) < 1e-9
        assert wsi.extract_px == 32  # round(16 / 0.4942)
        tile = wsi.read_tile(0, 0)
        np.testing.assert_array_equal(np.asarray(tile), img[:32, :32])
        wsi.close()
