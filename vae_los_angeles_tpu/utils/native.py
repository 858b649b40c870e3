"""On-demand build + ctypes loader for the framework's native (C++) kernels.

The reference is 100% Python (SURVEY §2: zero native components), so the
only place native code pays here is the host-side data-prep hot spot: the
patient×probe pivot/imputation of ``prepare_dna`` (reference
scripts/prepare_dna.py:33-65), whose pandas formulation materializes an
O(P·K) cross-product of Python tuples. The C++ kernel in
``data/_native/pivot_impute.cpp`` does the same transform in one pass over
flat arrays.

Build strategy: compile with ``g++ -O3 -shared -fPIC`` into a per-user
cache directory, keyed by a hash of the source (recompiles only when the
source changes), and load via ctypes — no pybind11/Python.h needed.
Everything degrades gracefully: any failure (no toolchain, sandboxed tmp,
exotic platform) returns None and callers fall back to the pandas path.
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "_native")


def _build(src_path: str, stem: str):
    with open(src_path, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    cache_dir = os.path.join(tempfile.gettempdir(), "vae_los_angeles_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{stem}-{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".build-{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src_path, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)  # atomic: concurrent builders converge
    return ctypes.CDLL(so_path)


@functools.lru_cache(maxsize=None)
def load_pivot_impute():
    """ctypes handle to ``pivot_impute`` (see pivot_impute.cpp), or None."""
    try:
        lib = _build(
            os.path.join(_NATIVE_DIR, "pivot_impute.cpp"), "pivot_impute"
        )
        fn = lib.pivot_impute
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_int32),  # pat
            ctypes.POINTER(ctypes.c_int32),  # probe
            ctypes.POINTER(ctypes.c_double),  # beta
            ctypes.c_int64,  # n
            ctypes.c_int32,  # P
            ctypes.c_int32,  # K
            ctypes.POINTER(ctypes.c_double),  # out (P*K)
        ]
        return fn
    except Exception:
        return None
