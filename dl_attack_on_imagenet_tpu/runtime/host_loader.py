"""ctypes bindings for the native C++ host data-loader (native/host_loader.cpp).

The native library provides libjpeg decode + the reference transform
(shorter-side resize 256 -> center crop 224 -> [0,1] float NHWC,
DS_ImageNet.py:14-18) on a thread pool, plus a ring-buffer prefetching batch
loader — the C++ replacement for torch's DataLoader worker processes
(adil.py:130, :363).

The .so is built on demand via ``make -C native`` and everything degrades
gracefully to the PIL path when the toolchain or libjpeg is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libadil_host.so")


def _build() -> bool:
    if not os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        return False
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


class NativeRuntime:
    """Loaded native library handle."""

    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        lib.adil_decode_batch.restype = ctypes.c_int
        lib.adil_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
        lib.adil_loader_create.restype = ctypes.c_void_p
        lib.adil_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ]
        lib.adil_loader_next.restype = ctypes.c_int64
        lib.adil_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.adil_loader_next_indexed.restype = ctypes.c_int64
        lib.adil_loader_next_indexed.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.adil_loader_num_batches.restype = ctypes.c_int64
        lib.adil_loader_num_batches.argtypes = [ctypes.c_void_p]
        lib.adil_loader_destroy.restype = None
        lib.adil_loader_destroy.argtypes = [ctypes.c_void_p]

    def decode_batch(
        self, paths: Sequence[str], size: int = 224, resize: int = 256
    ) -> np.ndarray:
        """Thread-pool decode of JPEG files -> (N, size, size, 3) float32."""
        n = len(paths)
        out = np.zeros((n, size, size, 3), np.float32)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = self._lib.adil_decode_batch(
            arr, n, size, resize, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IOError(f"native decode failed for {-rc} of {n} files")
        return out


class HostLoader:
    """Prefetching batch iterator over (paths, labels) backed by C++ threads.

    Yields (batch_index, images (B, S, S, 3) float32, labels (B,) int64) with
    -1 labels marking padding in the final batch and -2 marking failed
    decodes (corrupt/non-JPEG files) — filter with ``labels >= 0``.
    """

    def __init__(
        self,
        runtime: NativeRuntime,
        paths: Sequence[str],
        labels: Sequence[int],
        batch_size: int,
        image_size: int = 224,
        resize: int = 256,
        shuffle: bool = False,
        seed: int = 0,
        queue_depth: int = 4,
        n_threads: int = 0,
    ):
        assert len(paths) == len(labels)
        self._rt = runtime
        self._batch = batch_size
        self._size = image_size
        n = len(paths)
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        lab = np.asarray(labels, np.int64)
        self._handle = runtime._lib.adil_loader_create(
            arr, lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            batch_size, image_size, resize, int(shuffle), seed, queue_depth,
            n_threads,
        )
        self.num_batches = int(runtime._lib.adil_loader_num_batches(self._handle))

    def __iter__(self):
        for _ in range(self.num_batches):
            images = np.empty((self._batch, self._size, self._size, 3), np.float32)
            labels = np.empty((self._batch,), np.int64)
            idx = self._rt._lib.adil_loader_next(
                self._handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if idx < 0:
                return
            yield int(idx), images, labels

    def iter_indexed(self):
        """Like ``__iter__`` but also yields the ORIGINAL dataset row id of
        each slot (-1 = padding) — what training needs to address per-image
        state (the ADiL code matrix ``v``) under native shuffling; the
        indexed-subset analog of the reference's Subset_I
        (imagenet_loading.py:8-18)."""
        for _ in range(self.num_batches):
            images = np.empty((self._batch, self._size, self._size, 3), np.float32)
            labels = np.empty((self._batch,), np.int64)
            indices = np.empty((self._batch,), np.int64)
            idx = self._rt._lib.adil_loader_next_indexed(
                self._handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            if idx < 0:
                return
            yield int(idx), images, labels, indices

    def close(self):
        if self._handle:
            self._rt._lib.adil_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_runtime: Optional[NativeRuntime] = None
_tried = False


def get_runtime(build: bool = True) -> Optional[NativeRuntime]:
    """Load (building if needed) the native runtime; None if unavailable."""
    global _runtime, _tried
    if _runtime is not None or _tried:
        return _runtime
    _tried = True
    if not os.path.exists(_LIB_PATH) and build:
        _build()
    if os.path.exists(_LIB_PATH):
        try:
            _runtime = NativeRuntime(ctypes.CDLL(_LIB_PATH))
        except OSError:
            _runtime = None
    return _runtime
