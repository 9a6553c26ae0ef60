"""ctypes bindings for the native tile decoder (tiffdec.cpp).

Builds ``libunet_native.so`` on first import if a C++ toolchain is present
(g++ + zlib headers are baked into this image); every entry point degrades
gracefully to the pure-Python codec when the native library is unavailable,
so the framework never hard-depends on the build step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libunet_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


# ABI version the Python bindings were written against; a stale .so
# (from an older checkout) is rebuilt in place.
_ABI_VERSION = 4


def _build() -> bool:
    srcs = [_HERE / "tiffdec.cpp", _HERE / "jpegdec.cpp"]
    if not all(s.exists() for s in srcs):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
             *[str(s) for s in srcs], "-o", str(_LIB_PATH),
             "-lz", "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load_checked() -> Optional[ctypes.CDLL]:
    """dlopen the .so and verify its ABI version; None on mismatch."""
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.unet_native_version.restype = ctypes.c_int
        if lib.unet_native_version() >= _ABI_VERSION:
            return lib
    except (OSError, AttributeError):
        pass
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("UNET_TPU_NO_NATIVE"):
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = _load_checked()
    if lib is None:  # stale or broken .so: rebuild once
        if not _build():
            return None
        lib = _load_checked()
        if lib is None:
            return None
    try:
        lib.unet_decode_batch.restype = ctypes.c_int
        lib.unet_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.unet_decode_masks.restype = ctypes.c_int
        lib.unet_decode_masks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.unet_decode_batch_raw.restype = ctypes.c_int
        lib.unet_decode_batch_raw.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        codec_sig = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
                     ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong]
        for fn in ("unet_lzw_decode", "unet_lzw_encode",
                   "unet_packbits_decode", "unet_packbits_encode"):
            getattr(lib, fn).restype = ctypes.c_longlong
            getattr(lib, fn).argtypes = codec_sig
        intp = ctypes.POINTER(ctypes.c_int)
        lib.unet_jpeg_dims.restype = ctypes.c_int
        lib.unet_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, intp, intp, intp,
        ]
        lib.unet_jpeg_decode.restype = ctypes.c_int
        lib.unet_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            intp, intp, intp, ctypes.c_int,
        ]
        lib.unet_jpeg_info.restype = ctypes.c_int
        lib.unet_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, intp, intp, intp, intp, intp,
        ]
        lib.unet_jpeg_decode16.restype = ctypes.c_int
        lib.unet_jpeg_decode16.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_longlong,
            intp, intp, intp, intp,
        ]
        _lib = lib
    except (OSError, AttributeError):
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def _paths_array(paths: List) -> "ctypes.Array":
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [str(p).encode() for p in paths]
    return arr


def decode_batch(paths: List, height: int, width: int, channels: int,
                 n_threads: int = 8, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode equally-sized tiles into an (N,H,W,C) float32 batch in
    parallel native threads. Raises on failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, channels), np.float32)
    stride = height * width * channels
    rc = lib.unet_decode_batch(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), stride,
        height, width, channels, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native decode failed on tile {rc - 1}: {paths[rc - 1]}")
    return out


def decode_batch_raw(paths: List, height: int, width: int, channels: int,
                     dtype: np.dtype, n_threads: int = 8,
                     out: Optional[np.ndarray] = None) -> np.ndarray:
    """Decode equally-sized tiles into an (N,H,W,C) batch in the files' own
    sample type — 1 byte/px stays 1 byte/px through host RAM and the
    host→device transfer. Raises on failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    dt = np.dtype(dtype)
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width, channels), dt)
    stride = height * width * channels * dt.itemsize
    rc = lib.unet_decode_batch_raw(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), stride,
        height, width, channels, dt.itemsize, int(dt.kind == "f"), n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native raw decode failed on tile {rc - 1}: {paths[rc - 1]}")
    return out


def decode_masks(paths: List, height: int, width: int,
                 n_threads: int = 8, out: Optional[np.ndarray] = None) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, height, width), np.int32)
    rc = lib.unet_decode_masks(
        _paths_array(paths), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), height * width,
        height, width, n_threads,
    )
    if rc != 0:
        raise RuntimeError(f"native mask decode failed on tile {rc - 1}: {paths[rc - 1]}")
    return out


def _codec_call(fn_name: str, data: bytes, cap: int) -> Optional[bytes]:
    """Run one of the native byte codecs; None if unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return None
    src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data) if data else \
        (ctypes.c_uint8 * 1)()
    dst = (ctypes.c_uint8 * max(cap, 1))()
    n = getattr(lib, fn_name)(src, len(data), dst, cap)
    if n < 0:
        return None
    return bytes(bytearray(dst)[: n])


def lzw_decode(data: bytes, expected: int) -> Optional[bytes]:
    """Native TIFF-LZW decode (expected = exact decoded size)."""
    out = _codec_call("unet_lzw_decode", data, expected)
    return out if out is not None and len(out) == expected else None


def lzw_encode(data: bytes) -> Optional[bytes]:
    return _codec_call("unet_lzw_encode", data, 2 * len(data) + 1024)


def packbits_decode(data: bytes, expected: int) -> Optional[bytes]:
    out = _codec_call("unet_packbits_decode", data, expected)
    return out if out is not None and len(out) == expected else None


def packbits_encode(data: bytes) -> Optional[bytes]:
    return _codec_call("unet_packbits_encode", data, 2 * len(data) + 1024)


def jpeg_decode(data: bytes, tables: Optional[bytes] = None,
                color_transform: Optional[bool] = None) -> Optional[np.ndarray]:
    """Native JPEG decode → (H, W, C) uint8 (baseline/progressive DCT) or
    uint8/uint16 (lossless SOF3, by frame precision); None when the native
    library is unavailable or the stream needs the Python/PIL path
    (arithmetic, 12-bit DCT). Mirrors geo.jpeg.decode semantics; the TIFF
    codec tries this first and falls back transparently."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    prec = ctypes.c_int()
    mode = ctypes.c_int()
    if lib.unet_jpeg_info(data, len(data), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c), ctypes.byref(prec),
                          ctypes.byref(mode)) != 0:
        return None
    if h.value <= 0 or w.value <= 0 or not 1 <= c.value <= 4:
        return None
    if h.value * w.value * c.value > 1 << 30:
        # a TIFF strip/tile segment is never GiB-scale decoded; a forged
        # frame header must not drive the allocation (decode scratch is
        # ~10x the output size)
        return None
    if mode.value == 2:  # lossless
        try:
            out16 = np.empty((h.value, w.value, c.value), np.uint16)
        except MemoryError:
            return None
        rc = lib.unet_jpeg_decode16(
            data, len(data), tables, len(tables) if tables else 0,
            out16.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), out16.size,
            ctypes.byref(h), ctypes.byref(w), ctypes.byref(c),
            ctypes.byref(prec),
        )
        if rc != 0:
            return None
        return out16.astype(np.uint8) if prec.value <= 8 else out16
    try:
        out = np.empty((h.value, w.value, c.value), np.uint8)
    except MemoryError:
        return None
    ct = -1 if color_transform is None else int(bool(color_transform))
    rc = lib.unet_jpeg_decode(
        data, len(data), tables, len(tables) if tables else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        ctypes.byref(h), ctypes.byref(w), ctypes.byref(c), ct,
    )
    if rc != 0:
        return None
    return out
