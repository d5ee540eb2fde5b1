"""Local RTL-SDR USB ingest via a ctypes binding over librtlsdr.

TPU-native counterpart of the reference's device runtime: device
enumeration with serials (/root/reference/jonti/sdr.cpp:248-273,
sdrj.cpp:306-311), StartRtl-style configure + async reader thread
feeding a drop-on-full ring (jonti/sdr.cpp:73-184), two-phase shutdown
(jonti/sdr.cpp:187-243), runtime retune (sdrj.cpp:190-200), and the
bias-tee open-set-close dance when no device is running
(sdrj.cpp:202-238).

The shared library is resolved from ``$SDRX_LIBRTLSDR`` (used by the
tests to point at a fake ABI-compatible stub) or the usual sonames.
Everything degrades to a clean "not available" when absent — the rest
of the framework (rtl_tcp, file ingest) does not depend on this module.
"""

from __future__ import annotations

import ctypes
import os
import threading
from dataclasses import dataclass

import numpy as np

from . import native

_SONAMES = ("librtlsdr.so.2", "librtlsdr.so.0", "librtlsdr.so")

_LIB: ctypes.CDLL | None = None
_LIB_PATH: str | None = None

_READ_CB = ctypes.CFUNCTYPE(
    None, ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32, ctypes.c_void_p
)


def _declare(lib: ctypes.CDLL) -> ctypes.CDLL:
    p = ctypes.c_void_p
    lib.rtlsdr_get_device_count.restype = ctypes.c_uint32
    lib.rtlsdr_get_device_count.argtypes = []
    lib.rtlsdr_get_device_name.restype = ctypes.c_char_p
    lib.rtlsdr_get_device_name.argtypes = [ctypes.c_uint32]
    lib.rtlsdr_get_device_usb_strings.restype = ctypes.c_int
    lib.rtlsdr_get_device_usb_strings.argtypes = [
        ctypes.c_uint32,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_char_p,
    ]
    lib.rtlsdr_open.restype = ctypes.c_int
    lib.rtlsdr_open.argtypes = [ctypes.POINTER(p), ctypes.c_uint32]
    lib.rtlsdr_close.restype = ctypes.c_int
    lib.rtlsdr_close.argtypes = [p]
    for name in (
        "rtlsdr_set_sample_rate",
        "rtlsdr_set_center_freq",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [p, ctypes.c_uint32]
    for name in (
        "rtlsdr_set_tuner_gain_mode",
        "rtlsdr_set_tuner_gain",
        "rtlsdr_set_agc_mode",
        "rtlsdr_set_bias_tee",
    ):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [p, ctypes.c_int]
    lib.rtlsdr_get_tuner_gains.restype = ctypes.c_int
    lib.rtlsdr_get_tuner_gains.argtypes = [p, ctypes.POINTER(ctypes.c_int)]
    lib.rtlsdr_reset_buffer.restype = ctypes.c_int
    lib.rtlsdr_reset_buffer.argtypes = [p]
    lib.rtlsdr_read_async.restype = ctypes.c_int
    lib.rtlsdr_read_async.argtypes = [
        p,
        _READ_CB,
        ctypes.c_void_p,
        ctypes.c_uint32,
        ctypes.c_uint32,
    ]
    lib.rtlsdr_cancel_async.restype = ctypes.c_int
    lib.rtlsdr_cancel_async.argtypes = [p]
    return lib


def load_library() -> ctypes.CDLL | None:
    """dlopen librtlsdr (or the $SDRX_LIBRTLSDR override); None if absent."""
    global _LIB, _LIB_PATH
    override = os.environ.get("SDRX_LIBRTLSDR", "")
    if _LIB is not None and _LIB_PATH == (override or _LIB_PATH):
        return _LIB
    candidates = [override] if override else list(_SONAMES)
    for cand in candidates:
        try:
            _LIB = _declare(ctypes.CDLL(cand))
            _LIB_PATH = cand
            return _LIB
        except OSError:
            continue
    _LIB = None
    _LIB_PATH = None
    return None


def available() -> bool:
    return load_library() is not None


@dataclass(frozen=True)
class DeviceInfo:
    index: int
    name: str
    manufacturer: str
    product: str
    serial: str


def enumerate_devices() -> list[DeviceInfo]:
    """All attached devices with USB strings (jonti/sdr.cpp:248-273)."""
    lib = load_library()
    if lib is None:
        return []
    out = []
    for i in range(int(lib.rtlsdr_get_device_count())):
        name = lib.rtlsdr_get_device_name(i) or b""
        manu = ctypes.create_string_buffer(256)
        prod = ctypes.create_string_buffer(256)
        serial = ctypes.create_string_buffer(256)
        lib.rtlsdr_get_device_usb_strings(i, manu, prod, serial)
        out.append(
            DeviceInfo(
                index=i,
                name=name.decode(errors="replace"),
                manufacturer=manu.value.decode(errors="replace"),
                product=prod.value.decode(errors="replace"),
                serial=serial.value.decode(errors="replace"),
            )
        )
    return out


def index_by_serial(serial: str) -> int:
    """First device index whose serial matches, else -1 (sdrj.cpp:306-311)."""
    for dev in enumerate_devices():
        if dev.serial == serial:
            return dev.index
    return -1


class RtlUsbDevice:
    """One open RTL2832U device driving the native ingest ring.

    Lifecycle mirrors the reference: ``open`` (sdr::OpenRtl), ``start``
    (sdr::StartRtl — manual gain mode with the ini's tenths-of-dB gain,
    AGC off, reset_buffer, then rtlsdr_read_async on a worker thread
    whose callback pushes each u8 block into the 20-slot ring,
    dropping when full), ``stop`` (cancel_async then join then drain,
    jonti/sdr.cpp:187-243), ``close``.
    """

    def __init__(self, index: int = 0):
        lib = load_library()
        if lib is None:
            raise RuntimeError(
                "librtlsdr not found (set SDRX_LIBRTLSDR or install rtl-sdr)"
            )
        self._lib = lib
        self.index = index
        self._dev = ctypes.c_void_p()
        res = lib.rtlsdr_open(ctypes.byref(self._dev), index)
        if res != 0:
            raise RuntimeError(f"rtlsdr_open({index}) failed: {res}")
        self.ring: native.IngestRing | None = None
        self._thread: threading.Thread | None = None
        self._cb_ref = None  # keep the CFUNCTYPE object alive
        self.active = False
        self.dropped_blocks = 0
        self.restarts = 0
        self._params: tuple | None = None

    # -- configuration ----------------------------------------------------
    def set_center_freq(self, frequency: int) -> int:
        return self._lib.rtlsdr_set_center_freq(self._dev, int(frequency))

    def set_bias_tee(self, on: bool) -> int:
        return self._lib.rtlsdr_set_bias_tee(self._dev, 1 if on else 0)

    def supported_gains(self) -> list[int]:
        n = self._lib.rtlsdr_get_tuner_gains(self._dev, None)
        if n <= 0:
            return []
        buf = (ctypes.c_int * n)()
        self._lib.rtlsdr_get_tuner_gains(self._dev, buf)
        return list(buf)

    # -- streaming ---------------------------------------------------------
    def start(
        self,
        sample_rate: int,
        frequency: int,
        buflen_bytes: int,
        gain_tenths_db: int,
        n_slots: int = 20,
    ) -> None:
        if self.active:
            raise RuntimeError("already streaming")
        self._params = (
            int(sample_rate), int(frequency), int(buflen_bytes),
            int(gain_tenths_db), int(n_slots),
        )
        lib = self._lib
        lib.rtlsdr_reset_buffer(self._dev)
        lib.rtlsdr_set_sample_rate(self._dev, int(sample_rate))
        lib.rtlsdr_set_center_freq(self._dev, int(frequency))
        lib.rtlsdr_set_tuner_gain_mode(self._dev, 1)
        lib.rtlsdr_set_tuner_gain(self._dev, int(gain_tenths_db))
        lib.rtlsdr_set_agc_mode(self._dev, 0)

        self.ring = native.IngestRing(
            block_bytes=int(buflen_bytes), n_slots=n_slots
        )

        def _callback(buf, length, _ctx):
            # USB callback thread -> ring slot; drop whole buffer when the
            # ring is full, exactly like jonti/sdr.cpp:104-111.
            if self.ring is None:
                return
            arr = ctypes.cast(
                buf, ctypes.POINTER(ctypes.c_uint8 * length)
            ).contents
            if self.ring.push(np.frombuffer(arr, dtype=np.uint8)) == 1:
                self.dropped_blocks += 1

        self._cb_ref = _READ_CB(_callback)

        def _reader():
            lib.rtlsdr_read_async(
                self._dev, self._cb_ref, None, 0, int(buflen_bytes)
            )
            if self.ring is not None:
                self.ring.close()

        self._thread = threading.Thread(
            target=_reader, name="rtlsdr_read_async", daemon=True
        )
        self._thread.start()
        self.active = True

    def stop(self) -> None:
        """Two-phase shutdown: cancel the async read, join, drain."""
        if not self.active:
            return
        self._lib.rtlsdr_cancel_async(self._dev)
        if self._thread is not None:
            self._thread.join(timeout=10.0)
            self._thread = None
        if self.ring is not None:
            self.ring.close()
        self.active = False

    def restart(self) -> bool:
        """Full recovery attempt after a stalled/lost stream: stop, close
        the (possibly dead) handle, re-open the same index, and restart
        streaming with the last ``start`` parameters.  The reference keeps
        its process alive but needs a manual restart (sdrj.cpp:107-123);
        this is the automatic version the run loop calls when the ingest
        ring goes silent.  Returns True when streaming again (with a NEW
        ring — readers must re-read ``self.ring``)."""
        if self._params is None:
            return False
        try:
            self.stop()
        except Exception:
            self.active = False
        if self._dev:
            try:
                self._lib.rtlsdr_close(self._dev)
            except Exception:
                pass
            self._dev = ctypes.c_void_p()
        if self._lib.rtlsdr_open(ctypes.byref(self._dev), self.index) != 0:
            return False
        try:
            self.start(*self._params)
        except RuntimeError:
            return False
        self.restarts += 1
        return True

    def close(self) -> None:
        self.stop()
        if self._dev:
            self._lib.rtlsdr_close(self._dev)
            self._dev = ctypes.c_void_p()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def bias_tee_standalone(on: bool, device_idx: int = 0) -> bool:
    """Bias-tee when no device is running: open, set, close
    (the reference's dance at sdrj.cpp:202-238)."""
    lib = load_library()
    if lib is None:
        return False
    dev = ctypes.c_void_p()
    if lib.rtlsdr_open(ctypes.byref(dev), device_idx) != 0:
        return False
    try:
        return lib.rtlsdr_set_bias_tee(dev, 1 if on else 0) == 0
    finally:
        lib.rtlsdr_close(dev)
