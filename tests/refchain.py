"""Faithful numpy/scipy model of the reference receiver's signal chain.

An INDEPENDENT implementation (float64, scipy convolutions) of the exact math
the reference executes per sample, used as the golden model for end-to-end
audio SNR tests (BASELINE.md: >= 60 dB demodulated-audio SNR vs the reference
chain).  Formula sources:

  DC EMA           sdrj.cpp:277-283      m[n] = m[n-1](1-a) + a x[n]; y = x - m
  NCO mix          oscillator.cpp:4-30   y[n] = x[n] e^{+j 2 pi f n / fs}
  half-band /2     halfbanddecimator.cpp:43-72 (11-tap, emit even samples)
  late /5 /6       vfo.cpp:70-101,334-387 (low_pass(2, L*r, r/2, r/(L-1)), emit n%L==0)
  USB demod        vfo.cpp:300-332       delay62(I) - hilbert125(Q)
  audio LPF        vfo.cpp:106-124       low_pass(2, r, bw, bw/4)
  quantize         vfo.cpp:328           short(usb * gain * 32768)  (truncates)

This model uses ideal (exact-phase) oscillators and exact block streaming; the
reference's minor numeric quirks (float32 wavetable with renormalization,
one-sample-stale FIRQueueBackToFront copy) are below the SNR bound by design.
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def lp_taps(gain, fs, cutoff, transition):
    """float64 windowed-sinc low-pass per gnuradio/firfilter.cpp:64-106."""
    ntaps = int(53.0 * fs / (22.0 * transition))
    if ntaps % 2 == 0:
        ntaps += 1
    m = (ntaps - 1) // 2
    n = np.arange(-m, m + 1, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2 * np.pi * (n + m) / (ntaps - 1))
    h = np.where(n == 0, 2 * cutoff / fs, np.sin(2 * np.pi * cutoff / fs * n) / (np.pi * np.where(n == 0, 1, n)))
    h = h * w
    return h * (gain / h.sum())


def hilbert_taps(length=125):
    n = np.arange(length) - length // 2
    c = np.zeros(length)
    nz = n != 0
    c[nz] = (1 - np.cos(np.pi * n[nz])) / (np.pi * n[nz])
    return c / np.sqrt(np.sum(c * c))


HB11 = np.array(
    [
        0.0060431029837374152,
        0.0,
        -0.049372515458761493,
        0.0,
        0.29332944952052842,
        0.5,
        0.29332944952052842,
        0.0,
        -0.049372515458761493,
        0.0,
        0.0060431029837374152,
    ]
)


def causal(x, taps):
    """y[n] = sum_k taps[k] x[n-k], zero history."""
    return scipy.signal.convolve(x, taps)[: len(x)]


def dc_correct(x, alpha=1e-6):
    """EMA DC removal; y[n] = x[n] - m[n] with m the updated mean."""
    b = [alpha]
    a = [1.0, -(1.0 - alpha)]
    m = scipy.signal.lfilter(b, a, x)
    return x - m


def mix(x, f, fs):
    n = np.arange(len(x))
    return x * np.exp(2j * np.pi * f * n / fs)


def halfband_cascade(x, stages):
    for _ in range(stages):
        x = causal(x, HB11)[::2]
    return x


def late_decimate(x, out_rate, factor):
    """The reference's plain FIR (fir_decI/Q) delays by ONE EXTRA sample —
    FIRUpdateAndProcess reads the N inputs before the current one
    (jonti/dsp.cpp:59-71) — modeled by the leading zero tap (verified
    against the compiled reference in tests/test_oracle.py)."""
    taps = lp_taps(2.0, out_rate * factor, out_rate / 2.0, out_rate / (factor - 1.0))
    return causal(x, np.concatenate([[0.0], taps]))[::factor]


def usb_demod(x, filter_bw=0, out_rate=None):
    h = hilbert_taps()
    delayed = np.concatenate([np.zeros(62), x.real])[: len(x)]
    usb = delayed - causal(x.imag, h)
    if filter_bw > 0:
        # fir_usb is the same plain FIR: one extra sample of delay
        usb = causal(
            usb,
            np.concatenate([[0.0], lp_taps(2.0, out_rate, filter_bw, filter_bw / 4.0)]),
        )
    return usb


def quantize(audio, gain):
    """The reference's float->short cast (truncation toward zero)."""
    v = np.trunc(audio * gain * 32768.0)
    return np.clip(v, -32768, 32767).astype(np.int16)


def channel_chain(
    iq,
    fs,
    main_mixer,
    main_stages,
    sub_mixer,
    sub_stages,
    late_factor=1,
    out_rate=48000,
    filter_bw=0,
    gain=0.05,
    dc=True,
):
    """Full reference chain for ONE channel, whole-signal (no blocking)."""
    x = dc_correct(iq) if dc else iq
    z = halfband_cascade(mix(x, main_mixer, fs), main_stages)
    group_rate = fs >> main_stages
    y = halfband_cascade(mix(z, sub_mixer, group_rate), sub_stages)
    if late_factor > 1:
        y = late_decimate(y, out_rate, late_factor)
    audio = usb_demod(y, filter_bw, out_rate)
    return audio, quantize(audio, gain)
