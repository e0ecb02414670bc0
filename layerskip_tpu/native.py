"""ctypes binding for the native runtime components (native/*.cc).

``read_safetensors(path)`` parses + loads one shard with the C++ mmap reader
(zero-copy views into the page cache, parallel materialization); falls back
to the pure-Python ``safetensors`` package when the shared library is absent
or unbuildable. ``load_shards(paths)`` loads many shards concurrently.

The reference has no native code at all (SURVEY §2 preamble); checkpoint
load is its Python/HF path (generate.py:54-67). At 7B+ scale load time is
IO/memcpy bound, which is what this component attacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libsafetensors_reader.so")
_METRICS_LIB_PATH = os.path.join(_NATIVE_DIR, "lib", "libtext_metrics.so")

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": None,  # special-cased: numpy lacks bfloat16; viewed as uint16
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}

_lib = None
_lib_lock = threading.Lock()


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.exists(_LIB_PATH):
            build = os.path.join(_NATIVE_DIR, "build.sh")
            if os.path.exists(build):
                try:
                    subprocess.run([build], check=True, capture_output=True)
                except Exception:
                    _lib = False
                    return None
            else:
                _lib = False
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib = False
            return None
        lib.st_open.restype = ctypes.c_void_p
        lib.st_open.argtypes = [ctypes.c_char_p]
        lib.st_close.argtypes = [ctypes.c_void_p]
        lib.st_num_tensors.restype = ctypes.c_int64
        lib.st_num_tensors.argtypes = [ctypes.c_void_p]
        lib.st_tensor_name.restype = ctypes.c_char_p
        lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_tensor_dtype.restype = ctypes.c_char_p
        lib.st_tensor_dtype.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_tensor_ndim.restype = ctypes.c_int64
        lib.st_tensor_ndim.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_tensor_shape.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)
        ]
        lib.st_tensor_nbytes.restype = ctypes.c_int64
        lib.st_tensor_nbytes.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_tensor_data.restype = ctypes.c_void_p
        lib.st_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.st_copy_tensors.restype = ctypes.c_int
        lib.st_copy_tensors.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    return _get_lib() is not None


def _np_view(dtype_tag: str, shape, buf) -> np.ndarray:
    if dtype_tag == "BF16":
        # view as uint16; converted via jax/ml_dtypes downstream
        arr = np.frombuffer(buf, dtype=np.uint16).reshape(shape)
        try:
            import ml_dtypes

            return arr.view(ml_dtypes.bfloat16)
        except ImportError:
            return arr
    np_dt = _DTYPES.get(dtype_tag)
    if np_dt is None:
        raise ValueError(f"unsupported safetensors dtype {dtype_tag}")
    return np.frombuffer(buf, dtype=np_dt).reshape(shape)


def read_safetensors(path: str, nthreads: int = 8) -> Dict[str, np.ndarray]:
    """Load one shard into a dict of (owned) numpy arrays."""
    lib = _get_lib()
    if lib is None:
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
        return out

    h = lib.st_open(path.encode())
    if not h:
        raise OSError(f"native reader failed to open {path}")
    try:
        n = lib.st_num_tensors(h)
        metas = []
        bufs = []
        idx = (ctypes.c_int64 * n)()
        dsts = (ctypes.c_void_p * n)()
        for i in range(n):
            name = lib.st_tensor_name(h, i).decode()
            dtype = lib.st_tensor_dtype(h, i).decode()
            nd = lib.st_tensor_ndim(h, i)
            shp = (ctypes.c_int64 * max(nd, 1))()
            lib.st_tensor_shape(h, i, shp)
            shape = tuple(shp[d] for d in range(nd))
            nbytes = lib.st_tensor_nbytes(h, i)
            buf = bytearray(nbytes)
            metas.append((name, dtype, shape))
            bufs.append(buf)
            idx[i] = i
            dsts[i] = ctypes.addressof((ctypes.c_char * nbytes).from_buffer(buf))
        rc = lib.st_copy_tensors(h, idx, dsts, n, nthreads)
        if rc != 0:
            raise OSError(f"native copy failed for {path}")
        return {
            name: _np_view(dtype, shape, bytes(buf))
            for (name, dtype, shape), buf in zip(metas, bufs)
        }
    finally:
        lib.st_close(h)


def load_shards(paths: List[str], nthreads: int = 8) -> Dict[str, np.ndarray]:
    """Load several shards concurrently (one worker per shard)."""
    out: Dict[str, np.ndarray] = {}
    if len(paths) <= 1:
        for p in paths:
            out.update(read_safetensors(p, nthreads))
        return out
    lock = threading.Lock()
    threads = []

    def work(p):
        d = read_safetensors(p, max(nthreads // len(paths), 1))
        with lock:
            out.update(d)

    for p in paths:
        t = threading.Thread(target=work, args=(p,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    return out


# ---------------------------------------------------------------------------
# Native text metrics (levenshtein / LCS) — used by layerskip_tpu.metrics.
# ---------------------------------------------------------------------------

_metrics_lib = None
_metrics_lock = threading.Lock()


def _get_metrics_lib():
    global _metrics_lib
    with _metrics_lock:
        if _metrics_lib is not None:
            return _metrics_lib or None
        if not os.path.exists(_METRICS_LIB_PATH):
            build = os.path.join(_NATIVE_DIR, "build.sh")
            try:
                subprocess.run([build], check=True, capture_output=True)
            except Exception:
                _metrics_lib = False
                return None
        try:
            lib = ctypes.CDLL(_METRICS_LIB_PATH)
        except OSError:
            _metrics_lib = False
            return None
        for fn in (lib.levenshtein_u32, lib.lcs_u32):
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ]
        _metrics_lib = lib
        return lib


def _u32(arr) -> "np.ndarray":
    return np.ascontiguousarray(arr, dtype=np.uint32)


def levenshtein(a, b) -> int:
    """Edit distance between two sequences of ints (or strings)."""
    if isinstance(a, str):
        a = [ord(c) for c in a]
    if isinstance(b, str):
        b = [ord(c) for c in b]
    lib = _get_metrics_lib()
    if lib is None:
        return None  # caller falls back to the Python implementation
    aa, bb = _u32(a), _u32(b)
    return int(lib.levenshtein_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
    ))


def lcs_length(a, b) -> int:
    """Longest-common-subsequence length of two int sequences."""
    lib = _get_metrics_lib()
    if lib is None:
        return None
    aa, bb = _u32(a), _u32(b)
    return int(lib.lcs_u32(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(bb),
    ))
