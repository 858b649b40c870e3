"""On-demand build + ctypes loader for the framework's native (C++) kernels.

The reference is 100% Python (SURVEY §2: zero native components), so the
only place native code pays here is the host-side data-prep hot spot: the
patient×probe pivot/imputation of ``prepare_dna`` (reference
scripts/prepare_dna.py:33-65), whose pandas formulation materializes an
O(P·K) cross-product of Python tuples. The C++ kernel in
``data/_native/pivot_impute.cpp`` does the same transform in one pass over
flat arrays.

Build strategy: compile with ``g++ -O3 -shared -fPIC`` into a per-user
cache directory (``$XDG_CACHE_HOME``/``~/.cache``, falling back to a
uid-suffixed tmp dir created 0700 — never a shared world-writable path,
which would allow cross-user .so planting), keyed by a hash of the source
so edits recompile. Loaded via ctypes — no pybind11/Python.h needed. A
cached .so that fails to load (e.g. a corrupt artifact from an interrupted
build) is rebuilt once. Everything degrades gracefully: any failure (no
toolchain, unwritable cache, exotic platform) returns None and callers fall
back to the pandas path.
"""

from __future__ import annotations

import ctypes
import functools
import hashlib
import os
import subprocess
import tempfile

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "_native")


def _cache_dir() -> str:
    root = os.environ.get("XDG_CACHE_HOME")
    if not root:
        home = os.path.expanduser("~")
        root = os.path.join(home, ".cache") if home != "~" else None
    if root:
        path = os.path.join(root, "vae_los_angeles_tpu", "native")
    else:
        path = os.path.join(
            tempfile.gettempdir(), f"vae_los_angeles_tpu_native-{os.getuid()}"
        )
    os.makedirs(path, mode=0o700, exist_ok=True)
    return path


def _compile(src_path: str, so_path: str) -> None:
    fd, tmp = tempfile.mkstemp(
        suffix=".so", dir=os.path.dirname(so_path)
    )  # unique per builder: concurrent builds cannot interleave writes
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src_path, "-o", tmp],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so_path)  # atomic publish
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _build(src_path: str, stem: str):
    with open(src_path, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"{stem}-{tag}.so")
    if not os.path.exists(so_path):
        _compile(src_path, so_path)
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        # stale/corrupt cache entry: rebuild once, then let failures surface
        os.unlink(so_path)
        _compile(src_path, so_path)
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
