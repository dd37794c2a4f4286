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
    """Compile the shared library with make; returns its path. make's own
    timestamp check makes this a no-op when the .so is fresh — always
    invoking it prevents a stale library (older than policy_runtime.cc)
    from being loaded with missing symbols."""
    try:
        if force:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "clean"], check=True,
                capture_output=True,
            )
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    except (FileNotFoundError, subprocess.CalledProcessError):
        # no toolchain on this host (deployment image): a prebuilt library
        # is acceptable — it just can't be refreshed here
        if not os.path.exists(_LIB_PATH):
            raise
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
        self._lib.puppax_policy_gait_enabled.argtypes = [ctypes.c_void_p]
        self._lib.puppax_policy_gait_frequency.argtypes = [ctypes.c_void_p]
        self._lib.puppax_policy_gait_frequency.restype = ctypes.c_double
        self._lib.puppax_policy_reset_clock.argtypes = [ctypes.c_void_p]
        self._lib.puppax_policy_infer_clocked.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        self._handle = self._lib.puppax_policy_load(json_path.encode())
        if not self._handle:
            raise ValueError(f"native runtime rejected policy: {json_path}")
        self.in_dim = self._lib.puppax_policy_in_dim(self._handle)
        self.out_dim = self._lib.puppax_policy_out_dim(self._handle)
        self.gait_enabled = bool(self._lib.puppax_policy_gait_enabled(self._handle))
        self.gait_frequency = float(
            self._lib.puppax_policy_gait_frequency(self._handle)
        )

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

    def reset_clock(self):
        """Zero the runtime's free-running gait clock."""
        self._lib.puppax_policy_reset_clock(self._handle)

    def infer_clocked(self, obs) -> np.ndarray:
        """Gait-policy tick: pass the RAW obs history (in_dim - 2 floats);
        the runtime appends [cos, sin] of its clock and advances it
        (use-then-advance — tick 0 sees phase 0, like the env's reset)."""
        want = self.in_dim - 2 if self.gait_enabled else self.in_dim
        obs = np.ascontiguousarray(obs, np.float32)
        assert obs.shape == (want,), (obs.shape, want)
        out = np.empty(self.out_dim, np.float32)
        rc = self._lib.puppax_policy_infer_clocked(
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
