"""sdrreceiver_tpu — a TPU-native software-radio channelizer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jeroenbeijer/SDRReceiver (see SURVEY.md): wideband complex IQ in, a two-level
tree of digital down-converter channels ("VFOs") out, each mixed, decimated
through half-band FIR cascades (plus polyphase /5 and /6 stages for
non-power-of-two rates), optionally low-pass filtered, USB-demodulated and
quantized to int16 audio frames published over ZeroMQ for JAERO.

Architectural stance (not a port):
  * Everything is a pure block function ``(state, x) -> (state, y)`` over
    channel-batched ``[chan, time]`` arrays; streaming FIR/NCO/EMA state is an
    explicit pytree instead of C++ object members
    (contrast: reference vfo.cpp:235-296 per-sample loops).
  * The whole per-block signal chain compiles to ONE jitted XLA program.
  * Distribution is mesh sharding (channels x time) with collective halo
    exchange of FIR history, not threads + ring buffers
    (contrast: reference jonti/sdr.cpp:100-184).

Subpackages:
  core     block-streaming substrate (state pytrees, chunked runners)
  kernels  pure-jnp DSP kernels (golden-tested vs reference formulas)
  pallas   fused TPU Pallas kernels shadowing the jnp kernels
  graph    ini-compatible config -> static channelizer plan -> jitted pipeline
  dist     device-mesh sharding: channel batching, time halo exchange
  io       IQ file ingest, rtl_tcp client, ZMQ publisher (wire-compatible)
  obs      spectrum/metrics/profiling (replaces the reference's Qt scope)
  cli      command-line entry points (run / process-file / bench)
"""

__version__ = "0.1.0"
