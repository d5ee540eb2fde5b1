"""Non-power-of-two "late" decimation: the /5 and /6 polyphase stages.

At 1.92 Msps (main out 240 kHz) and 288 ksps (288 kHz) the tidy /2 chain
cannot reach the 48k-family audio rates, so the reference decimates the last
stage by 5 or 6 with a windowed-sinc FIR evaluated only at output phases
(vfo.cpp:70-101 design, vfo.cpp:334-387 phase-skipping loop).  The design
call is

    low_pass(gain=2, fs=target*L, cutoff=target/2,
             transition=target/(L-1), HAMMING)       (vfo.cpp:82-87)

and the output phase is input index 0 mod L (check==0 emits, vfo.cpp:351-368).
Here that whole construction is one strided grouped convolution — a standard
polyphase decimator computing only kept phases.
"""

from __future__ import annotations

import numpy as np

from . import design
from .fir import conv_block, prepare_taps

__all__ = ["late_decim_taps", "late_decim_apply"]


def late_decim_taps(target_rate: int, factor: int) -> np.ndarray:
    """Design the /L anti-alias FIR exactly as the reference does
    (vfo.cpp:82-87; gain=2 is deliberate there and reproduced)."""
    if factor < 2:
        raise ValueError("late decimation factor must be >= 2")
    return design.low_pass(
        gain=2.0,
        sampling_freq=float(target_rate * factor),
        cutoff_freq=target_rate / 2.0,
        transition_width=target_rate / float(factor - 1),
        win=design.Window.HAMMING,
    )


def late_decim_apply(hist, x, rtaps, factor: int):
    """Streaming /L decimation step: conv_block with stride=L.

    hist ``[C, ntaps-1]``, x ``[C, T]`` complex (T divisible by L),
    returns ``[C, T/L]``.
    """
    return conv_block(hist, x, rtaps, stride=factor)
