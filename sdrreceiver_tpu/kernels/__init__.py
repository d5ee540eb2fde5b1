"""Pure-jnp DSP kernels (the correctness-golden layer).

Every kernel is a stateless function or a ``(state, x) -> (state, y)`` block
processor; Pallas twins in ``sdrreceiver_tpu.pallas`` shadow the hot ones and
are property-tested against these.
"""

from . import compress, dc, design, fir, halfband, ingest, nco, ossfft, polyphase, usbdemod

__all__ = [
    "compress",
    "dc",
    "design",
    "fir",
    "halfband",
    "ingest",
    "nco",
    "ossfft",
    "polyphase",
    "usbdemod",
]
