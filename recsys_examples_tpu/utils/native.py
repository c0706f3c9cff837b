"""ctypes bindings for the native (C++) runtime components in csrc/.

The reference implements its host-side runtime pieces in C++ (KK
partitioner examples/commons/perf_model/csrc/kk_partition.cpp, host KV
storage corelib/recsys_kvcache_manager/src/runtime/); this module builds
and loads the TPU framework's equivalents on demand (make; no pybind11 —
plain C ABI via ctypes)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")


def _build_and_load(libname: str) -> Optional[ctypes.CDLL]:
    path = os.path.join(_CSRC, libname)
    # Always invoke make: its dependency tracking decides staleness (a
    # no-op when up to date), so edits to the C++ sources are picked up
    # instead of silently running a stale binary.
    try:
        subprocess.run(
            ["make", "-C", _CSRC, libname], check=True,
            capture_output=True,
        )
    except Exception:
        if not os.path.exists(path):
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


_host_lib = None
_host_lib_tried = False


def _host_store_lib() -> Optional[ctypes.CDLL]:
    global _host_lib, _host_lib_tried
    if not _host_lib_tried:
        _host_lib_tried = True
        lib = _build_and_load("libhost_store.so")
        if lib is not None:
            lib.host_store_create.restype = ctypes.c_void_p
            lib.host_store_create.argtypes = [ctypes.c_int64]
            lib.host_store_destroy.argtypes = [ctypes.c_void_p]
            lib.host_store_size.restype = ctypes.c_int64
            lib.host_store_size.argtypes = [ctypes.c_void_p]
            lib.host_store_put.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.host_store_get.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.host_store_erase.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ]
            lib.host_store_export.restype = ctypes.c_int64
            lib.host_store_export.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,
            ]
        _host_lib = lib
    return _host_lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


class NativeHostStore:
    """int64 key -> (fixed-width row bytes, int64 score) native store.

    Rows are float32 [row_dim]. Falls back to a Python dict when the
    native library can't be built."""

    def __init__(self, row_dim: int):
        self.row_dim = row_dim
        self._lib = _host_store_lib()
        if self._lib is not None:
            self._h = ctypes.c_void_p(
                self._lib.host_store_create(row_dim * 4)
            )
        else:
            self._rows = {}
            self._scores = {}

    def __len__(self) -> int:
        if self._lib is not None:
            return int(self._lib.host_store_size(self._h))
        return len(self._rows)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def put(self, keys: np.ndarray, rows: np.ndarray,
            scores: Optional[np.ndarray] = None) -> None:
        keys = np.ascontiguousarray(keys, np.int64)
        rows = np.ascontiguousarray(rows, np.float32)
        n = len(keys)
        if n == 0:
            return
        if scores is None:
            scores = np.zeros((n,), np.int64)
        scores = np.ascontiguousarray(scores, np.int64)
        if self._lib is not None:
            self._lib.host_store_put(
                self._h, _ptr(keys), _ptr(rows), _ptr(scores), n
            )
        else:
            for i in range(n):
                self._rows[int(keys[i])] = rows[i].copy()
                self._scores[int(keys[i])] = int(scores[i])

    def get(self, keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(rows [n, row_dim] f32, found [n] bool)."""
        keys = np.ascontiguousarray(keys, np.int64)
        n = len(keys)
        rows = np.zeros((n, self.row_dim), np.float32)
        found = np.zeros((n,), np.uint8)
        if n == 0:
            return rows, found.astype(bool)
        if self._lib is not None:
            scores = np.zeros((n,), np.int64)
            self._lib.host_store_get(
                self._h, _ptr(keys), _ptr(rows), _ptr(scores), _ptr(found), n
            )
        else:
            for i in range(n):
                r = self._rows.get(int(keys[i]))
                if r is not None:
                    rows[i] = r
                    found[i] = 1
        return rows, found.astype(bool)

    def erase(self, keys: np.ndarray) -> None:
        keys = np.ascontiguousarray(keys, np.int64)
        if len(keys) == 0:
            return
        if self._lib is not None:
            self._lib.host_store_erase(self._h, _ptr(keys), len(keys))
        else:
            for k in keys:
                self._rows.pop(int(k), None)
                self._scores.pop(int(k), None)

    def export(self, score_threshold: int = 0, batch: int = 65536):
        """Yield (keys, rows, scores) batches with score >= threshold."""
        if self._lib is not None:
            cursor = ctypes.c_int64(0)
            while True:
                keys = np.zeros((batch,), np.int64)
                rows = np.zeros((batch, self.row_dim), np.float32)
                scores = np.zeros((batch,), np.int64)
                n = int(self._lib.host_store_export(
                    self._h, score_threshold, ctypes.byref(cursor), batch,
                    _ptr(keys), _ptr(rows), _ptr(scores),
                ))
                if n == 0:
                    break
                yield keys[:n], rows[:n], scores[:n]
        else:
            ks, rs, ss = [], [], []
            for k, r in self._rows.items():
                s = self._scores.get(k, 0)
                if s >= score_threshold:
                    ks.append(k); rs.append(r); ss.append(s)
                if len(ks) == batch:
                    yield (np.asarray(ks, np.int64), np.stack(rs),
                           np.asarray(ss, np.int64))
                    ks, rs, ss = [], [], []
            if ks:
                yield (np.asarray(ks, np.int64), np.stack(rs),
                       np.asarray(ss, np.int64))

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            try:
                self._lib.host_store_destroy(self._h)
            except Exception:
                pass


_asm_lib = None
_asm_tried = False


def batch_assembler_lib() -> Optional[ctypes.CDLL]:
    """libbatch_assembler.so (csrc/batch_assembler.cpp) or None."""
    global _asm_lib, _asm_tried
    if not _asm_tried:
        _asm_tried = True
        lib = _build_and_load("libbatch_assembler.so")
        if lib is not None:
            lib.assemble_batch.restype = ctypes.c_int64
            lib.assemble_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ]
        _asm_lib = lib
    return _asm_lib
