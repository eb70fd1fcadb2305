"""WAV I/O: ctypes binding to the native reader (csrc/wavio.cpp) with a pure
NumPy RIFF fallback.

Replaces the reference's soundfile dependency (ref: dataloader/dataset.py:85
sf.read, bin/test.py:102 sf.write PCM_16).  Always returns float32 (T, C)
arrays in [-1, 1]; writes PCM16.
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import Tuple

import numpy as np

_LIB = None
_LIB_TRIED = False


def _native():
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native", "libwavio.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.wav_info.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_read_f32.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
        lib.wav_read_f32.restype = ctypes.c_int64
        lib.wav_write_pcm16.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.c_int64, ctypes.c_int,
                                        ctypes.c_int]
        lib.wav_write_pcm16.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


# ---------------------------------------------------------------------------
# pure-python fallback
# ---------------------------------------------------------------------------

def _py_parse_header(f) -> Tuple[int, int, int, int, int, int]:
    """-> (format, channels, sample_rate, bits, data_offset, data_size)"""
    riff = f.read(12)
    if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    data = None
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            break
        cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
        if cid == b"fmt ":
            buf = f.read(size + (size & 1))
            tag, ch, sr = struct.unpack("<HHI", buf[:8])
            bits = struct.unpack("<H", buf[14:16])[0]
            if tag == 0xFFFE and size >= 26:
                tag = struct.unpack("<H", buf[24:26])[0]
            fmt = (tag, ch, sr, bits)
        elif cid == b"data":
            data = (f.tell(), size)
            f.seek(size + (size & 1), 1)
        else:
            f.seek(size + (size & 1), 1)
        if fmt and data:
            break
    if not fmt or not data:
        raise ValueError("missing fmt/data chunk")
    return (*fmt, *data)


def _py_read(path: str) -> Tuple[np.ndarray, int]:
    with open(path, "rb") as f:
        tag, ch, sr, bits, off, size = _py_parse_header(f)
        f.seek(off)
        raw = f.read(size)
    n = size // (bits // 8)
    if tag == 3 and bits == 32:
        x = np.frombuffer(raw, "<f4", count=n).astype(np.float32)
    elif tag == 1 and bits == 16:
        x = np.frombuffer(raw, "<i2", count=n).astype(np.float32) / 32768.0
    elif tag == 1 and bits == 24:
        b = np.frombuffer(raw, np.uint8, count=n * 3).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v & 0x800000, v - 0x1000000, v)
        x = v.astype(np.float32) / 8388608.0
    elif tag == 1 and bits == 32:
        x = np.frombuffer(raw, "<i4", count=n).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV format tag={tag} bits={bits}")
    return x.reshape(-1, ch), sr


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def wav_info(path: str) -> Tuple[int, int, int]:
    """-> (sample_rate, channels, frames)"""
    lib = _native()
    if lib is not None:
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        fr = ctypes.c_int64()
        rc = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                          ctypes.byref(fr))
        if rc == 0:
            return sr.value, ch.value, fr.value
    with open(path, "rb") as f:
        tag, ch, sr, bits, off, size = _py_parse_header(f)
    return sr, ch, size // (bits // 8) // ch


def wav_is_pcm16(path: str) -> bool:
    """Header-only probe: True iff the file parses as PCM16 WAV."""
    try:
        with open(path, "rb") as f:
            tag, _, _, bits, _, _ = _py_parse_header(f)
        return tag == 1 and bits == 16
    except (OSError, ValueError):
        return False


def read_wav_pcm16(path: str):
    """-> (int16 array (T, C), sample_rate) if the file is PCM16, else None
    (returns None on ANY parse/shape failure — callers fall back to the
    float read path).

    Raw samples without float conversion: a PCM16 batch shipped to the
    device and normalized there (x / 32768, exact in f32) is bit-identical
    to read_wav's host-side float conversion at half the transfer bytes."""
    try:
        with open(path, "rb") as f:
            tag, ch, sr, bits, off, size = _py_parse_header(f)
            if tag != 1 or bits != 16:
                return None
            f.seek(off)
            raw = f.read(size)
        x = np.frombuffer(raw, "<i2", count=len(raw) // 2)
        return x.reshape(-1, ch), sr
    except (OSError, ValueError):
        return None


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """-> (float32 array (T, C) in [-1, 1], sample_rate)"""
    lib = _native()
    if lib is not None:
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        fr = ctypes.c_int64()
        rc = lib.wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                          ctypes.byref(fr))
        if rc == 0:
            out = np.empty((fr.value, ch.value), np.float32)
            got = lib.wav_read_f32(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), fr.value)
            if got >= 0:
                return out[:got], sr.value
    return _py_read(path)


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write (T,) or (T, C) data as PCM16.

    float32 input is quantized with the symmetric 32768 scale; int16 input
    is written verbatim (already-quantized samples, e.g. device-side PCM16
    from codec_test)."""
    data = np.asarray(data)
    if data.dtype != np.int16:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[:, None]
    data = np.ascontiguousarray(data)
    frames, ch = data.shape
    if data.dtype == np.int16:
        q = data.astype("<i2", copy=False)
    else:
        lib = _native()
        if lib is not None:
            rc = lib.wav_write_pcm16(
                path.encode(),
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                frames, ch, sample_rate)
            if rc == 0:
                return
        # fallback: same 32768-scale symmetric quantization AND the same
        # round-half-away-from-zero convention as the native path
        v = data * 32768.0
        q = np.clip(np.trunc(v + np.where(v >= 0, 0.5, -0.5)),
                    -32768, 32767).astype("<i2")
    payload = q.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                      sample_rate * ch * 2, ch * 2, 16))
        f.write(b"data" + struct.pack("<I", len(payload)))
        f.write(payload)
