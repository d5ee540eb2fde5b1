"""Native (C++) ingest runtime loaded via ctypes.

Compiled on demand with g++ into a cached shared object; see ringbuffer.cpp
for the design (the reference's 20-slot ring + LUT runtime, jonti/sdr.cpp).
Falls back gracefully: ``available()`` is False when no toolchain exists and
the pure-Python pipeline keeps working.
"""

from .loader import IngestRing, available, load_library, u8_to_f32

__all__ = ["IngestRing", "available", "load_library", "u8_to_f32"]
