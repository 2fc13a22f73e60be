"""ctypes bindings for the native host-data library (native/oneprot_host.cc).

Loads `liboneprot_host.so` (built by `make native`; auto-built on first use
if a toolchain is present). Every entry point has a numpy fallback, so the
framework is fully functional without the native library — it is a
throughput optimization for the host hot loop (SURVEY §3.5).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
# repo layout first (native/ at the repo root, built by `make native`);
# installed-wheel layout second (a .so or .cc dropped next to this file is
# picked up via package-data — pyproject [tool.setuptools.package-data])
_SO_CANDIDATES = (os.path.join(_ROOT, "native", "liboneprot_host.so"),
                  os.path.join(_PKG_DIR, "liboneprot_host.so"))
_SRC_CANDIDATES = (os.path.join(_ROOT, "native", "oneprot_host.cc"),
                   os.path.join(_PKG_DIR, "oneprot_host.cc"))


def _first_existing(paths) -> Optional[str]:
    for p in paths:
        if os.path.isfile(p):
            return p
    return None


def _build(src: str, out: str) -> bool:
    """Compile to a process-unique temp file, then os.replace() into place:
    concurrent first-use across processes (e.g. an installed wheel's first
    import in several workers) must never CDLL-load a partially written .so
    (advisor r3 finding). os.replace is atomic within a directory."""
    tmp = f"{out}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             src, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("ONEPROT_NATIVE", "1") == "0":
        return None
    so_path = _first_existing(_SO_CANDIDATES)
    if so_path is None:
        src = _first_existing(_SRC_CANDIDATES)
        if src is not None:
            out = os.path.join(os.path.dirname(src), "liboneprot_host.so")
            if _build(src, out):
                so_path = out
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.tokenize_batch.argtypes = [
        u8p, i64p, ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.knn_neighbors.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_float, i32p, f32p]
    lib.greedy_select.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# High-level wrappers
# ---------------------------------------------------------------------------


def tokenize_batch(
    sequences: Sequence[str],
    lut: np.ndarray,  # [256] int32
    cls_id: int, eos_id: int, pad_id: int,
    max_len: int, pad_to: int,
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    blobs = [s.encode("utf-8", errors="replace") for s in sequences]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = np.frombuffer(b"".join(blobs) or b"\0", np.uint8).copy()
    out = np.empty((len(blobs), pad_to), np.int32)
    lib.tokenize_batch(data, offsets, len(blobs), np.ascontiguousarray(lut),
                       cls_id, eos_id, pad_id, max_len, pad_to, out)
    return out


def knn_neighbors(coords: np.ndarray, k: int,
                  cutoff: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.float32)
    n = coords.shape[0]
    idx = np.empty((n, k), np.int32)
    mask = np.empty((n, k), np.float32)
    lib.knn_neighbors(coords, n, k, cutoff, idx, mask)
    return idx, mask


def greedy_select_indices(msa_bytes: np.ndarray, num_seqs: int,
                          mode: str = "max") -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    msa_bytes = np.ascontiguousarray(msa_bytes, np.uint8)
    rows, cols = msa_bytes.shape
    n_out = min(num_seqs, rows)
    out = np.empty(n_out, np.int32)
    lib.greedy_select(msa_bytes, rows, cols, n_out,
                      1 if mode == "max" else 0, out)
    return out
