"""ctypes bindings for the native featurization runtime (native/csrc).

Loads ``native/libdruglamp_native.so`` when built (``make -C native``); every
entry point has a pure-Python fallback (chem/smiles.py + chem/featurize.py)
so the framework runs without the native build.  Parity between the two is
enforced by tests/test_native.py over the full dataset corpus.
"""

from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(here, "native", "libdruglamp_native.so")


def _try_build(path: str) -> bool:
    """Build libdruglamp_native.so on demand (make -C native).

    The library shipped unbuilt in round 3, so the parity suite silently
    skipped and the CLI fell back to the Python parser; building lazily at
    first load (single translation unit, ~2 s) closes that gap wherever a
    C++ toolchain exists.  Truly atomic (advisor r4: the compiler writes the
    .so in place non-atomically, so a concurrent first-load could dlopen a
    partially written library): the build is serialized by an flock on the
    native dir AND compiles to a pid-suffixed temp name that is os.rename()d
    — atomic within a filesystem — into place.  Disable with
    DRUGLAMP_NO_NATIVE_BUILD=1 (e.g. sandboxed CI)."""
    if os.environ.get("DRUGLAMP_NO_NATIVE_BUILD", "0") == "1":
        return False
    import fcntl
    import shutil
    import subprocess
    import sys

    native_dir = os.path.dirname(path)
    src = os.path.join(native_dir, "csrc", "druglamp_native.cc")
    if not os.path.exists(src) or shutil.which("make") is None \
            or shutil.which(os.environ.get("CXX", "g++")) is None:
        return False
    tmp_name = f"{os.path.basename(path)}.tmp.{os.getpid()}"
    tmp_path = os.path.join(native_dir, tmp_name)
    try:
        with open(os.path.join(native_dir, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)   # released on close
            if os.path.exists(path):            # another process built it
                return True
            print("[druglamp] building native runtime (make -C native, "
                  "first import only)...", file=sys.stderr, flush=True)
            r = subprocess.run(["make", "-C", native_dir, f"LIB={tmp_name}"],
                               capture_output=True, timeout=120)
            if r.returncode != 0 or not os.path.exists(tmp_path):
                return False
            os.rename(tmp_path, path)
            return True
    except Exception:
        return False
    finally:
        try:
            if os.path.exists(tmp_path):
                os.unlink(tmp_path)
        except OSError:
            pass


def load_native():
    """The native library or None if not built/loadable (builds on demand
    when the sources and a C++ toolchain are present)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and not _try_build(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.dl_parse_featurize.restype = ctypes.c_int
    lib.dl_parse_featurize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.dl_assemble_batch.restype = None
    lib.dl_assemble_batch.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
    ]
    lib.dl_feature_dim.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return load_native() is not None


def parse_featurize(smiles: str, max_nodes: int = 512, max_edges: int = 4096
                    ) -> Tuple[np.ndarray, np.ndarray, int]:
    """(node_feats (n,74), edges (2,E), n_atoms) via the native parser.

    Raises ValueError on parse errors (same failure surface as the Python
    parser).  Edges are directed pairs, both directions, no self-loops.
    """
    lib = load_native()
    assert lib is not None, "native library not built (make -C native)"
    feats = np.zeros((max_nodes, 74), np.float32)
    edges = np.zeros((2, max_edges), np.int32)
    n_atoms = ctypes.c_int32(0)
    n_edges = ctypes.c_int32(0)
    err = ctypes.create_string_buffer(256)
    rc = lib.dl_parse_featurize(
        smiles.encode(), max_nodes, max_edges,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(n_atoms), ctypes.byref(n_edges), err, len(err))
    if rc == 1:
        raise ValueError(f"SMILES parse error: {err.value.decode()} in {smiles!r}")
    if rc == 2:
        raise ValueError(f"molecule exceeds max_nodes={max_nodes}")
    if rc == 3:
        raise ValueError(f"molecule exceeds max_edges={max_edges}")
    n, m = n_atoms.value, n_edges.value
    return feats[:n].copy(), edges[:, :m].copy(), n


def assemble_batch(edge_list, n_atoms: np.ndarray, N: int
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Dense adjacency + degrees for a batch from per-sample edge arrays.

    edge_list: sequence of (2, E_b) int32 arrays (both-direction bond pairs).
    Returns (adj (B,N,N) uint8, degrees (B,N) float32).
    """
    lib = load_native()
    assert lib is not None, "native library not built (make -C native)"
    B = len(edge_list)
    counts = [e.shape[1] for e in edge_list]
    offsets = np.zeros(B + 1, np.int32)
    np.cumsum(counts, out=offsets[1:])
    total = int(offsets[-1])
    packed = np.zeros((max(total, 1), 2), np.int32)
    for b, e in enumerate(edge_list):
        packed[offsets[b] : offsets[b + 1], 0] = e[0]
        packed[offsets[b] : offsets[b + 1], 1] = e[1]
    adj = np.empty((B, N, N), np.uint8)
    degrees = np.empty((B, N), np.float32)
    na = np.ascontiguousarray(n_atoms, dtype=np.int32)
    lib.dl_assemble_batch(
        B, N,
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        na.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        degrees.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return adj, degrees
