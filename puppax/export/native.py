"""ctypes bridge to the native policy runtime (native/policy_runtime.cc).

Lets Python code — and the ABI round-trip tests — drive the same C++
forward pass the robot runs, proving the exported JSON is consumable by a
native runtime bit-for-bit (the reference's on-robot controller consumed
this format outside its repo; here the consumer is in-tree).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpuppax_policy.so")


def build_native_runtime(force: bool = False) -> str:
    """Compile the shared library with make (idempotent); returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    return _LIB_PATH


class NativePolicy:
    """A policy loaded into the C++ runtime."""

    def __init__(self, json_path: str, lib_path: Optional[str] = None):
        lib_path = lib_path or build_native_runtime()
        self._lib = ctypes.CDLL(lib_path)
        self._lib.puppax_policy_load.restype = ctypes.c_void_p
        self._lib.puppax_policy_load.argtypes = [ctypes.c_char_p]
        self._lib.puppax_policy_in_dim.argtypes = [ctypes.c_void_p]
        self._lib.puppax_policy_out_dim.argtypes = [ctypes.c_void_p]
        self._lib.puppax_policy_infer.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self._lib.puppax_policy_free.argtypes = [ctypes.c_void_p]
        self._handle = self._lib.puppax_policy_load(json_path.encode())
        if not self._handle:
            raise ValueError(f"native runtime rejected policy: {json_path}")
        self.in_dim = self._lib.puppax_policy_in_dim(self._handle)
        self.out_dim = self._lib.puppax_policy_out_dim(self._handle)

    def __call__(self, obs) -> np.ndarray:
        obs = np.ascontiguousarray(obs, np.float32)
        assert obs.shape == (self.in_dim,), (obs.shape, self.in_dim)
        out = np.empty(self.out_dim, np.float32)
        rc = self._lib.puppax_policy_infer(
            self._handle,
            obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError("native inference failed")
        return out

    def close(self):
        if self._handle:
            self._lib.puppax_policy_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - gc timing
        try:
            self.close()
        except Exception:
            pass
