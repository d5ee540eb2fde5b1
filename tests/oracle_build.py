"""Build + load the compiled-REFERENCE golden oracle (VERDICT r1 item 3).

Compiles the reference's pure-DSP sources from /root/reference (read-only:
gnuradio/firfilter.cpp, jonti/dsp.cpp, halfbanddecimator.cpp, oscillator.cpp)
together with tests/oracle/oracle_wrapper.cpp and a minimal QVector shim into
a test-only shared library, loaded via ctypes.  The oracle is therefore the
reference's OWN compiled code — a shared misreading of e.g. the half-band
phase convention between the framework and a hand-written model cannot
survive these tests.

Built at -O2 (NOT the reference's -Ofast: fast-math would change float
semantics and make bit-level tap comparisons meaningless).
"""

from __future__ import annotations

import ctypes
import hashlib
import pathlib
import subprocess

import numpy as np

REFERENCE = pathlib.Path("/root/reference")
HERE = pathlib.Path(__file__).resolve().parent
ORACLE_DIR = HERE / "oracle"
BUILD_DIR = ORACLE_DIR / "_build"

REF_SOURCES = [
    REFERENCE / "gnuradio/firfilter.cpp",
    REFERENCE / "jonti/dsp.cpp",
    REFERENCE / "halfbanddecimator.cpp",
    REFERENCE / "oscillator.cpp",
]
WRAPPER = ORACLE_DIR / "oracle_wrapper.cpp"

_F32P = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")


def _source_digest() -> str:
    """Content hash of every input to the oracle build (mtime comparisons
    are unreliable after a fresh checkout: git sets worktree mtimes to
    checkout time, so a stale prebuilt .so could win the race)."""
    h = hashlib.sha256()
    deps = REF_SOURCES + [WRAPPER] + sorted((ORACLE_DIR / "shim").iterdir())
    for d in deps:
        h.update(str(d).encode())
        h.update(d.read_bytes())
    return h.hexdigest()


def build_oracle() -> pathlib.Path:
    """Compile (if the source digest changed) and return the oracle .so path.

    The build directory is gitignored — the .so is never committed; the
    digest stamp next to it makes staleness purely content-based."""
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    so = BUILD_DIR / "liboracle.so"
    stamp = BUILD_DIR / "liboracle.digest"
    digest = _source_digest()
    if so.exists() and stamp.exists() and stamp.read_text() == digest:
        return so
    cmd = [
        "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
        f"-I{ORACLE_DIR / 'shim'}",
        f"-I{REFERENCE}",
        *[str(s) for s in REF_SOURCES],
        str(WRAPPER),
        "-o", str(so),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    stamp.write_text(digest)
    return so


class Oracle:
    """ctypes facade over the compiled reference."""

    def __init__(self):
        self.lib = ctypes.CDLL(str(build_oracle()))
        lib = self.lib
        lib.ref_low_pass.restype = ctypes.c_int
        lib.ref_low_pass.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, _F32P, ctypes.c_int,
        ]
        lib.ref_hilbert_taps.restype = ctypes.c_int
        lib.ref_hilbert_taps.argtypes = [ctypes.c_int, ctypes.c_int, _F32P]
        lib.ref_osc_new.restype = ctypes.c_void_p
        lib.ref_osc_new.argtypes = [ctypes.c_double, ctypes.c_double]
        lib.ref_osc_run.argtypes = [ctypes.c_void_p, ctypes.c_int, _F32P, _F32P]
        lib.ref_osc_free.argtypes = [ctypes.c_void_p]
        lib.ref_hbd_new.restype = ctypes.c_void_p
        lib.ref_hbd_new.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.ref_hbd_decimate.argtypes = [
            ctypes.c_void_p, _F32P, _F32P, ctypes.c_int, _F32P, _F32P,
        ]
        lib.ref_hbd_free.argtypes = [ctypes.c_void_p]
        lib.ref_chain_new.restype = ctypes.c_void_p
        lib.ref_chain_new.argtypes = [
            ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.ref_chain_process.restype = ctypes.c_int
        lib.ref_chain_process.argtypes = [
            ctypes.c_void_p, _F32P, _F32P, ctypes.c_int, _I16P,
        ]
        lib.ref_chain_free.argtypes = [ctypes.c_void_p]

    # -- designers ----------------------------------------------------------
    def low_pass(self, gain, fs, cutoff, transition, window=0, beta=6.76):
        out = np.zeros(65536, np.float32)
        n = self.lib.ref_low_pass(gain, fs, cutoff, transition, window, beta,
                                  out, out.size)
        if n < 0:
            raise ValueError(f"reference low_pass failed ({n})")
        return out[:n].copy()

    def hilbert_taps(self, length=125, fs=48000):
        out = np.zeros(length, np.float32)
        self.lib.ref_hilbert_taps(length, fs, out)
        return out

    # -- oscillator ----------------------------------------------------------
    def oscillator(self, fs, freq, n):
        h = self.lib.ref_osc_new(float(fs), float(freq))
        re = np.zeros(n, np.float32)
        im = np.zeros(n, np.float32)
        self.lib.ref_osc_run(h, n, re, im)
        self.lib.ref_osc_free(h)
        return re + 1j * im

    # -- streaming half-band decimator ---------------------------------------
    def halfband_stream(self, blocks, taps=11):
        """Run complex blocks through ONE HalfBandDecimator, carrying state
        across calls (the reference's FIRQueueBackToFront handoff)."""
        # FIR queue must hold the largest block fed to it (the reference
        # sizes it as Fs/2^stage for the same reason, vfo.cpp:130)
        h = self.lib.ref_hbd_new(taps, max(len(b) for b in blocks))
        outs = []
        try:
            for b in blocks:
                b = np.ascontiguousarray(b, np.complex64)
                out_re = np.zeros(len(b) // 2, np.float32)
                out_im = np.zeros(len(b) // 2, np.float32)
                self.lib.ref_hbd_decimate(
                    h,
                    np.ascontiguousarray(b.real),
                    np.ascontiguousarray(b.imag),
                    len(b), out_re, out_im,
                )
                outs.append(out_re + 1j * out_im)
        finally:
            self.lib.ref_hbd_free(h)
        return np.concatenate(outs)

    # -- full single-channel chain --------------------------------------------
    def chain(
        self,
        iq_blocks,
        fs,
        main_mixer_freq,
        main_stages,
        sub_mixer_freq,
        sub_stages,
        late_factor=1,
        filter_bw=0.0,
        gain=1.0,
        dc_correct=False,
    ):
        """int16 audio from the reference chain on complex64 blocks."""
        spb = len(iq_blocks[0])
        h = self.lib.ref_chain_new(
            float(fs), float(main_mixer_freq), int(main_stages),
            float(sub_mixer_freq), int(sub_stages), int(late_factor),
            float(filter_bw), float(gain), int(bool(dc_correct)), spb,
        )
        outs = []
        try:
            for b in iq_blocks:
                b = np.ascontiguousarray(b, np.complex64)
                cap = len(b)
                audio = np.zeros(cap, np.int16)
                n = self.lib.ref_chain_process(
                    h,
                    np.ascontiguousarray(b.real),
                    np.ascontiguousarray(b.imag),
                    len(b), audio,
                )
                outs.append(audio[:n].copy())
        finally:
            self.lib.ref_chain_free(h)
        return np.concatenate(outs)
