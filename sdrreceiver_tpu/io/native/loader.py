"""Build/load the native ingest library and wrap it with ctypes."""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import tempfile

import numpy as np

_SRC = pathlib.Path(__file__).with_name("ringbuffer.cpp")
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build_dir() -> pathlib.Path:
    d = pathlib.Path(tempfile.gettempdir()) / "sdrreceiver_tpu_native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def load_library() -> ctypes.CDLL | None:
    """Compile (once, content-hashed cache) and dlopen the native library."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = _SRC.read_bytes()
        tag = hashlib.sha256(src).hexdigest()[:16]
        so = _build_dir() / f"ringbuffer_{tag}.so"
        if not so.exists():
            tmp = so.with_suffix(".so.tmp")
            subprocess.run(
                [
                    "g++",
                    "-O3",
                    "-march=native",
                    "-shared",
                    "-fPIC",
                    "-std=c++17",
                    str(_SRC),
                    "-o",
                    str(tmp),
                ],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(str(so))
        lib.rb_create.restype = ctypes.c_void_p
        lib.rb_create.argtypes = [ctypes.c_int, ctypes.c_int64]
        lib.rb_destroy.argtypes = [ctypes.c_void_p]
        lib.rb_push.restype = ctypes.c_int
        lib.rb_push.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.rb_pop_f32.restype = ctypes.c_int64
        lib.rb_pop_f32.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.rb_pop_raw.restype = ctypes.c_int64
        lib.rb_pop_raw.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.rb_close.argtypes = [ctypes.c_void_p]
        for f in ("rb_stat_pushed", "rb_stat_popped", "rb_stat_dropped"):
            getattr(lib, f).restype = ctypes.c_uint64
            getattr(lib, f).argtypes = [ctypes.c_void_p]
        lib.rb_stat_depth.restype = ctypes.c_int
        lib.rb_stat_depth.argtypes = [ctypes.c_void_p]
        lib.u8_to_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return load_library() is not None


def u8_to_f32(raw: np.ndarray) -> np.ndarray:
    """Native u8 -> float32 LUT conversion ((v - 127), jonti/sdr.cpp:43-49)."""
    lib = load_library()
    raw = np.ascontiguousarray(raw, dtype=np.uint8)
    out = np.empty(raw.size, dtype=np.float32)
    if lib is None:
        out[:] = raw.astype(np.float32) - 127.0
        return out
    lib.u8_to_f32(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        raw.size,
    )
    return out


class IngestRing:
    """Python handle over the native SPSC block ring.

    The reference sizes its ring at 20 slots (jonti/sdr.h:89); same default.
    """

    def __init__(self, block_bytes: int, n_slots: int = 20):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native ingest library unavailable (no g++?)")
        self._lib = lib
        self._h = lib.rb_create(n_slots, block_bytes)
        if not self._h:
            raise MemoryError("rb_create failed")
        self.block_bytes = block_bytes
        self.n_slots = n_slots

    def push(self, data: np.ndarray, block_on_full: bool = False) -> int:
        """0 = stored, 1 = dropped (ring full), -1 = closed."""
        data = np.ascontiguousarray(data, dtype=np.uint8)
        return self._lib.rb_push(
            self._h,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            data.size,
            1 if block_on_full else 0,
        )

    def pop_f32(self, timeout_ms: int = -1) -> np.ndarray | None:
        """Converted float32 block, or None on timeout/closed-drained."""
        out = np.empty(self.block_bytes, dtype=np.float32)
        n = self._lib.rb_pop_f32(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.size,
            timeout_ms,
        )
        if n <= 0:
            return None
        return out[:n]

    def pop_raw(self, timeout_ms: int = -1) -> np.ndarray | None:
        out = np.empty(self.block_bytes, dtype=np.uint8)
        n = self._lib.rb_pop_raw(
            self._h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.size,
            timeout_ms,
        )
        if n <= 0:
            return None
        return out[:n]

    def close(self) -> None:
        if self._h:
            self._lib.rb_close(self._h)

    @property
    def stats(self) -> dict:
        return {
            "pushed": self._lib.rb_stat_pushed(self._h),
            "popped": self._lib.rb_stat_popped(self._h),
            "dropped": self._lib.rb_stat_dropped(self._h),
            "depth": self._lib.rb_stat_depth(self._h),
        }

    def __del__(self):
        try:
            if self._h:
                self._lib.rb_close(self._h)
                self._lib.rb_destroy(self._h)
                self._h = None
        except Exception:
            pass
