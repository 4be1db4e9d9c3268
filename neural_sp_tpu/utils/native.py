"""ctypes bindings for the native (C++) data-loader core.

Builds/loads ``native/libnsp_native.so`` lazily; every entry point has a
pure-Python fallback so the framework works without a toolchain, but the
loader and scorer hot paths use the native code when available (the in-repo
equivalent of the reference's kaldiio/python-Levenshtein/torch-worker C
extensions, SURVEY.md §2.11).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "native", "libnsp_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.dirname(so)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.nsp_read_npy_f32.restype = ctypes.c_int
    lib.nsp_read_kaldi_f32.restype = ctypes.c_int
    lib.nsp_collate_batch.restype = ctypes.c_int
    lib.nsp_edit_distance.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def read_npy_f32(path: str, max_frames: int = 1 << 20,
                 dim_hint: int = 80) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_frames * dim_hint, np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.nsp_read_npy_f32(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(buf.size), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        return None
    return buf[: rows.value * cols.value].reshape(
        rows.value, cols.value).copy()


def collate_batch(paths: list[str], offsets: list[int], t_pad: int,
                  dim: int) -> tuple[np.ndarray, np.ndarray] | None:
    """Fused read+pad: returns (batch [n, t_pad, dim] f32, lens [n] i32)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    batch = np.zeros((n, t_pad, dim), np.float32)
    lens = np.zeros(n, np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_off = np.asarray(offsets, np.int64)
    rc = lib.nsp_collate_batch(
        c_paths, c_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(n),
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(t_pad), ctypes.c_int64(dim),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return batch, lens


def edit_distance(ref: list[int], hyp: list[int]
                  ) -> tuple[int, int, int, int] | None:
    """(total, n_sub, n_ins, n_del) or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    r = np.asarray(ref, np.int32)
    h = np.asarray(hyp, np.int32)
    s = ctypes.c_int32()
    i = ctypes.c_int32()
    d = ctypes.c_int32()
    tot = lib.nsp_edit_distance(
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(r),
        h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(h),
        ctypes.byref(s), ctypes.byref(i), ctypes.byref(d))
    return tot, s.value, i.value, d.value


def read_flac(path: str):
    """Decode a FLAC file with the native decoder (native/nsp_flac.cc —
    LibriSpeech stage-0; the image has no sox/soundfile).

    Returns (float32 waveform [n] or [n, ch] in [-1, 1], sample_rate) or
    None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    if not hasattr(lib, "nsp_flac_decode"):
        return None
    lib.nsp_flac_info.restype = ctypes.c_int
    lib.nsp_flac_decode.restype = ctypes.c_int
    total = ctypes.c_int64()
    rate = ctypes.c_int32()
    ch = ctypes.c_int32()
    rc = lib.nsp_flac_info(path.encode(), ctypes.byref(total),
                           ctypes.byref(rate), ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"not a FLAC file (rc={rc}): {path}")
    # STREAMINFO total may be 0 (unknown) — fall back to a generous bound
    cap = int(total.value) if total.value > 0 else 1 << 26
    buf = np.empty(cap * max(int(ch.value), 1), np.int16)
    n = ctypes.c_int64()
    rc = lib.nsp_flac_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(cap), ctypes.byref(n), ctypes.byref(rate),
        ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"FLAC decode failed (rc={rc}): {path}")
    nch = int(ch.value)
    x = buf[: int(n.value) * nch].astype(np.float32) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch)
    return x, int(rate.value)
