"""Plan -> one jitted tensor program (the whole receiver as a block step).

The reference executes its VFO tree as nested per-object virtual calls on the
dispatcher thread (sdrj.cpp:288-294 -> vfo.cpp:235-296 recursion).  Here the
compiler walks the static :class:`~sdrreceiver_tpu.graph.plan.ReceiverPlan`
once at build time and emits a single pure function

    state', outputs = step(state, iq_block)

covering every group, bucket and channel; ``jax.jit`` then compiles it to one
XLA executable — mixing, all cascades, late decimation, USB demod, audio
filtering, quantization and IQ compression fused into one device program per
ingest block.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import stream
from ..kernels import (
    compress,
    dc,
    design,
    fir,
    halfband,
    ingest,
    nco,
    ossfft,
    usbdemod,
)
from ..utils import statevec
from .plan import ReceiverPlan

__all__ = ["CompiledReceiver", "compile_plan"]


class CompiledReceiver:
    """Executable form of a ReceiverPlan.

    Outputs of one step (all shapes static):
      ``pcm/g<i>/b<j>``   int16 ``[C*T_audio]`` one bucket's demodulated
                          audio, channel-major packed (emitting per-channel
                          rows from the jit costs ~90 us/step of int16
                          layout work on TPU — rows are split on host)
      ``iq/<topic>``      uint8 ``[T_group]`` packed compressed group IQ
                          (only for main VFOs configured to publish,
                          mainwindow.cpp:109-126)
    :meth:`split_audio` converts a step's (host-fetched) outputs into the
    public per-channel form ``audio/<topic>`` int16 ``[T_audio]`` as
    zero-copy views — run_pipeline does this before every callback; ``rates()``
    gives the sample rate for each public key (the value the ZMQ wire format
    carries, zmqpublisher.cpp:85-92).
    """

    def __init__(
        self,
        plan: ReceiverPlan,
        block_samples: int | None = None,
        emit_taps: tuple[str, ...] = (),
        use_pallas: bool = False,
        pallas_interpret: bool = False,
        ossfft_min_taps: int | None = 128,
        tap_samples: int | None = 8192,
    ):
        """``emit_taps``: also output intermediate baseband for observability
        — "main" (post-DC input), "g<i>" (group-cascade output), and/or a
        sub-VFO topic (that channel's decimated pre-demod baseband), the
        signals the reference's scope displays (sdrj.cpp:296-303,
        vfo.cpp:290-295).  Keys appear as ``tap/...`` outputs.

        ``use_pallas``: route every supported mix+cascade through the fused
        Pallas TPU kernel (pallas/frontend.py); unsupported shapes fall back
        to the jnp path per group/bucket.  ``pallas_interpret`` runs those
        kernels in interpreter mode (CPU testing).

        ``ossfft_min_taps``: audio filter banks with at least this many taps
        run through the overlap-save FFT convolution engine (kernels/ossfft —
        the kiss_fastfir capability) instead of direct convolution; None
        disables.

        ``tap_samples``: emitted taps carry only the LAST this-many samples
        of the block (None = full block).  The scope consumes exactly
        one 8192-point FFT frame per update (mainwindow.cpp:427), so
        fetching a whole 1.5 Msample main tap over a remote-TPU link would
        move ~190x more data than used; the default matches the scope's
        nfft."""
        self.plan = plan
        self.block = int(block_samples or plan.block_samples)
        self.emit_taps = tuple(emit_taps)
        self.use_pallas = bool(use_pallas)
        self.pallas_interpret = bool(pallas_interpret)
        self.ossfft_min_taps = ossfft_min_taps
        self.tap_samples = tap_samples
        valid = set(self.tap_rates())
        bad = set(self.emit_taps) - valid
        if bad:
            raise ValueError(f"unknown taps {sorted(bad)}; valid: {sorted(valid)}")
        div = plan.block_divisor()
        if self.block % div:
            raise ValueError(
                f"block of {self.block} samples not a multiple of chain divisor {div}"
            )
        self._consts: dict[str, Any] = {}
        self._build_consts()
        # The public steps carry the streaming state as ONE packed f32
        # vector (utils/statevec).  Two reasons: (1) restricted remote-TPU
        # backends cannot take complex64 executable arguments without losing
        # the ability to transfer ANY output; (2) the state pytree has ~120
        # tiny leaves and the remote runtime charges ~2-3.5 us per boundary
        # buffer — the pytree form costs more than the DSP itself (measured
        # round 3; PARITY.md).  XLA fuses the pack/unpack slices away.
        self._svec = statevec.StateVec(jax.eval_shape(self._init_state))
        self.step_iq = jax.jit(self._vec(self._step_iq), donate_argnums=(0,))
        self.step_u8 = jax.jit(self._vec(self._step_u8), donate_argnums=(0,))
        # interleaved-float32 entry: remote TPU backends cannot device_put
        # complex64 host arrays, so recordings are fed as raw f32 pairs and
        # packed to complex on device (sdrj.cpp:271-276 semantics)
        self.step_f32 = jax.jit(self._vec(self._step_f32), donate_argnums=(0,))
        # burst entries: process a [k, ...] stack of ingest blocks in ONE
        # dispatch via lax.scan (state carried exactly as in k single steps;
        # outputs gain a leading k axis).  The remote-TPU runtime charges a
        # ~25 us dispatch floor per executable call (PARITY.md round-3
        # anatomy) — for offline/throughput work, scanning k blocks per call
        # divides that floor by k.  Live realtime runs keep the single-block
        # steps (one dispatch per 0.25 s buffer is the latency-optimal shape).
        self.step_many_iq = jax.jit(
            self._vec_many(self._step_iq), donate_argnums=(0,)
        )
        self.step_many_u8 = jax.jit(
            self._vec_many(self._step_u8), donate_argnums=(0,)
        )
        self.step_many_f32 = jax.jit(
            self._vec_many(self._step_f32), donate_argnums=(0,)
        )

    def _vec(self, step):
        def wrapped(vec, block):
            new_state, outputs = step(self._svec.unpack(vec), block)
            return self._svec.pack(new_state), outputs

        return wrapped

    def _vec_many(self, step):
        """Scan the packed-state step over a leading block axis.

        ``_vec``'s ``(vec, block) -> (vec, outputs)`` is exactly a
        ``lax.scan`` body, so burst semantics are k single steps by
        construction — bit-for-bit, including in the sharded subclass
        (whose ``_vec`` override pins the state sharding each iteration)."""
        body = self._vec(step)

        def wrapped(vec, blocks):
            return jax.lax.scan(body, vec, blocks)

        return wrapped

    # ---------------------------------------------------------------- consts
    def _fused(
        self,
        key: str,
        channels: int,
        stages: int,
        fs: int,
        freqs,
        t_len: int,
        shared_input: bool = False,
    ):
        """Build (or skip) a fused Pallas mix+composite-cascade kernel.

        The kernel is STATELESS (pallas/frontend.py): the step prepends a
        ``warmup_len(stages)`` prefix (from the carried xtail for groups,
        from the derived previous-block group tail for buckets) and drops
        the warm-up outputs.  Stored as ``(kernel, warmup)``."""
        if not self.use_pallas or stages == 0:
            return None
        if not self.xtail_len():
            return None  # no carried tail to warm the stateless kernels
        from ..pallas.frontend import MixCascadeKernel, pick_warmup, supported

        warm = pick_warmup(stages, t_len, fs)
        if not supported(fs, stages, t_len + warm):
            return None
        self._kernels[key] = (
            MixCascadeKernel(
                channels,
                stages,
                fs,
                np.asarray(freqs, dtype=np.int64),
                t_len + warm,
                interpret=self.pallas_interpret,
                shared_input=shared_input,
            ),
            warm,
        )
        return self._kernels[key]

    def _want_dc_kernel(self) -> bool:
        """Hook: ShardedReceiver keeps the halo DC path (the fused kernel
        is a whole-contiguous-stream op; time shards need the cross-shard
        affine composition in dist/halo)."""
        return self.use_pallas and self.plan.dc_correct

    def _want_merged_front(self) -> bool:
        """Hook: ShardedReceiver builds per-shard kernels instead."""
        return True

    def _build_consts(self) -> None:
        self._kernels: dict[str, Any] = {}
        self._dc_kernel = None
        self._dc_kernel_u8 = None
        if self._want_dc_kernel():
            from ..pallas.dckernel import DcKernel, dc_supported

            if dc_supported(self.block):
                self._dc_kernel = DcKernel(
                    self.block, interpret=self.pallas_interpret
                )
                # u8 entry: ingest conversion fused INTO the DC pass (the
                # separate XLA u8->f32 materialization costs ~200 us/block
                # on TPU; the fused kernel reads 3 MB of i8 instead)
                self._dc_kernel_u8 = DcKernel(
                    self.block, interpret=self.pallas_interpret,
                    in_dtype=jnp.int8,
                )
        hb = design.half_band(11)
        hilb = design.hilbert()
        self._front_merged = None
        cands = [
            g for g in self.plan.groups if not g.direct and g.stages >= 1
        ]
        if (
            self.use_pallas
            and self._want_merged_front()
            and self.xtail_len()
            and len(cands) >= 2
        ):
            # ONE kernel for every group front: all groups mix the SAME
            # full-rate stream, and multi-channel kernels amortize the
            # per-row cost (measured r4: C=2 runs at ~1.65x a C=1 kernel,
            # not 2x), so the merged form beats per-group kernels even
            # though per-channel cascade depths differ (the kernel pads
            # each channel's band matrices to the widest output)
            from ..pallas.frontend import (
                MixCascadeKernel,
                pick_warmup,
                supported,
                warmup_len,
            )

            d_max = max(g.stages for g in cands)
            warm = pick_warmup(
                d_max, self.block, self.plan.fs,
                base=max(warmup_len(g.stages) for g in cands),
            )
            if supported(self.plan.fs, d_max, self.block + warm):
                kern = MixCascadeKernel(
                    len(cands),
                    [g.stages for g in cands],
                    self.plan.fs,
                    np.asarray([g.mixer_freq for g in cands], dtype=np.int64),
                    self.block + warm,
                    interpret=self.pallas_interpret,
                    shared_input=True,
                )
                self._front_merged = (kern, warm, [g.index for g in cands])
        for g in self.plan.groups:
            gk = f"g{g.index}"
            self._consts[f"{gk}/hb"] = fir.prepare_taps(hb, 1)
            if not g.direct and self._front_merged is None:
                self._fused(gk, 1, g.stages, self.plan.fs, [g.mixer_freq], self.block)
            tg = self.block >> g.stages
            for bi, b in enumerate(g.buckets):
                self._fused(
                    f"{gk}/b{bi}", b.channels, b.stages,
                    b.mix_fs(g.out_rate), b.mixer_freqs(), tg,
                    shared_input=True,
                )
            for bi, b in enumerate(g.buckets):
                bk = f"{gk}/b{bi}"
                c = b.channels
                self._consts[f"{bk}/hb"] = fir.prepare_taps(hb, c)
                self._consts[f"{bk}/hilbert"] = fir.prepare_taps(hilb, c)
                self._consts[f"{bk}/gains"] = b.gains()
                lt = b.late_taps()
                if lt is not None:
                    self._consts[f"{bk}/late"] = fir.prepare_taps(lt, c)
                at = b.audio_taps()
                if at is not None:
                    self._consts[f"{bk}/audio"] = fir.prepare_taps(at)
                    if (
                        self.ossfft_min_taps is not None
                        and at.shape[1] >= self.ossfft_min_taps
                    ):
                        self._consts[f"{bk}/audio_oss"] = ossfft.oss_prepare(at)

    # ----------------------------------------------------------------- state
    def init_state(self) -> jax.Array:
        """Fresh streaming state, in the packed-vector form the public steps
        use (opaque to callers; see :meth:`export_state` for a named view).

        Built under jit so the complex intermediates never materialize as
        device buffers: on restricted remote-TPU backends, materializing
        even one complex64 array breaks every later device->host transfer
        of the session (see utils/planar)."""
        return jax.jit(lambda: self._svec.pack(self._init_state()))()

    def xtail_len(self) -> int:
        """Length of the carried post-DC input tail ``state["xtail"]``.

        Every execution mode carries the last this-many post-DC input
        samples so a checkpoint taken ANYWHERE can resume into any Pallas
        mode: the stateless fused kernels warm up from this tail — group
        kernels directly, bucket kernels via the previous block's group
        output re-derived from it (so the tail must cover the bucket
        warm-up AT THE INPUT RATE plus the group washout), and the
        sharded front's shard-0 halo (dist/sharded.py).  0 = no cascaded
        groups, leaf absent."""
        from ..pallas.frontend import pick_warmup, warmup_len

        ps = []
        cands = [
            g for g in self.plan.groups if not g.direct and g.stages >= 1
        ]
        if len(cands) >= 2:
            # merged front kernel: one shared warm-up for all groups
            ps.append(pick_warmup(
                max(g.stages for g in cands), self.block, self.plan.fs,
                base=max(warmup_len(g.stages) for g in cands),
            ))
        for g in cands:
            # pick_warmup-padded lengths so the tail covers exactly what
            # the built kernels prepend (kernel warm-up may exceed the
            # washout minimum for tiling reasons)
            ps.append(pick_warmup(g.stages, self.block, self.plan.fs))
        for g in self.plan.groups:
            # bucket kernels exist for direct / stages==0 groups too
            # (_prev_group_tail takes the raw or mix-only xtail suffix
            # there); the tail must cover their warm-up AT THE INPUT RATE
            # plus, for cascaded groups, the group-front washout
            wg_washout = warmup_len(g.stages) if g.stages >= 1 else 0
            tg = self.block >> g.stages
            for b in g.buckets:
                if b.stages >= 1:
                    wb = pick_warmup(b.stages, tg, b.mix_fs(g.out_rate))
                    ps.append((1 << g.stages) * wb + wg_washout)
        p = max(ps, default=0)
        return p if 0 < p <= self.block else 0

    def _init_state(self) -> dict:
        plan = self.plan
        state: dict[str, Any] = {"dc": dc.dc_init_planar()}
        if self.xtail_len():
            state["xtail"] = jnp.zeros((2, self.xtail_len()), jnp.float32)
        for g in plan.groups:
            gs: dict[str, Any] = {}
            gk = f"g{g.index}"
            if not g.direct:
                gs["nco"] = nco.nco_init([g.mixer_freq], plan.fs)
                gs["cascade"] = halfband.cascade_init_planar(1, g.stages)
            for bi, b in enumerate(g.buckets):
                c = b.channels
                bs: dict[str, Any] = {
                    "nco": nco.nco_init(b.mixer_freqs(), b.mix_fs(g.out_rate)),
                    "usb": usbdemod.usb_init(c),
                    # ALWAYS the canonical per-stage-history layout, in
                    # every execution mode: the stateless Pallas kernels
                    # re-derive these from their warm-up tails each block
                    # (halfband.cascade_tails_from_tail), so checkpoints
                    # are mode-portable by construction
                    "cascade": halfband.cascade_init_planar(c, b.stages),
                }
                if b.late_factor > 1:
                    ntaps = self._consts[f"g{g.index}/b{bi}/late"].shape[1]
                    bs["late"] = fir.fir_history_init_planar(c, ntaps)
                if f"g{g.index}/b{bi}/audio" in self._consts:
                    ntaps = self._consts[f"g{g.index}/b{bi}/audio"].shape[1]
                    bs["audio"] = stream.fir_history_init(c, ntaps, jnp.float32)
                gs[f"b{bi}"] = bs
            state[f"g{g.index}"] = gs
        return state

    # ------------------------------------------------------------------ step
    #
    # Internal signal representation is PLANAR: every complex signal is an
    # (re, im) tuple of f32 arrays and no complex64 array exists anywhere in
    # the step.  complex64 intermediates lower to minor-dim-2 layouts on TPU
    # and cost 10-50x roofline per op (round-3 honest profile: the complex
    # step measured 25.4 ms/block of pure device time vs ~0.3 ms of DSP;
    # tools/layout_probe.py has the per-formulation data).

    @staticmethod
    def _rows_ext(prefix_r, prefix_i, rows):
        """Kernel input ``[1, R', 256]`` planes: a 1-D warm-up prefix (a
        LANES multiple, from the carried xtail or a derived group tail)
        concatenated IN ROW SPACE onto row planes — the pre-shaped form
        the Pallas kernels take without a 1-D<->rows layout conversion."""
        return (
            jnp.concatenate([prefix_r.reshape(-1, 256), rows[0]])[None],
            jnp.concatenate([prefix_i.reshape(-1, 256), rows[1]])[None],
        )

    def _tap(self, z) -> jax.Array:
        """Planar [2, T'] tap of a planar ``(re, im)`` signal, truncated to
        the LAST ``tap_samples`` — the scope shows the block's most recent
        window, like the reference FFT-ing the freshest buffer it is handed
        (mainwindow.cpp:418-427)."""
        zr, zi = z
        lim = self.tap_samples
        if lim is not None and zr.shape[-1] > lim:
            zr, zi = zr[..., -lim:], zi[..., -lim:]
        return jnp.stack([zr, zi])

    def _step_u8(self, state: dict, raw: jax.Array):
        if self._dc_kernel_u8 is not None:
            # fused ingest+DC: deinterleave at u8 width, convert + DC-correct
            # in ONE Pallas pass (pallas/dckernel.py in_dtype=int8).  The
            # full-rate planes stay in ROW form ([T/256, 256]) between the
            # DC kernel and the mix kernels — flattening to 1-D at each
            # pallas boundary is an XLA layout conversion (~170 us per
            # plane-pair per boundary, round 5); the 1-D views handed to
            # the non-kernel consumers (xtail, taps, jnp fallbacks) fuse
            # into their small gathers
            mean, x_rows = self._dc_kernel_u8(
                state["dc"], ingest.u8_iq_to_i8_rows(raw)
            )
            x = (x_rows[0].reshape(-1), x_rows[1].reshape(-1))
            return self._step_planar(state, x, dc_mean=mean, x_rows=x_rows)
        return self._step_planar(state, ingest.u8_iq_to_planar(raw))

    def _step_f32(self, state: dict, raw: jax.Array):
        if self._dc_kernel is not None:
            # f32-recording entry: same row-form plane discipline as the
            # u8 path (the kernel exists only for 256-aligned blocks;
            # it passes rows through and the mix kernels take them
            # pre-shaped — no 1-D<->rows layout conversions)
            mean, x_rows = self._dc_kernel(
                state["dc"], ingest.f32_pairs_to_rows(raw)
            )
            x = (x_rows[0].reshape(-1), x_rows[1].reshape(-1))
            return self._step_planar(state, x, dc_mean=mean, x_rows=x_rows)
        return self._step_planar(state, ingest.f32_pairs_to_planar(raw))

    def _step_iq(self, state: dict, iq: jax.Array):
        """Complex-input entry (tests / CPU recordings); the planar entries
        above are the TPU product path."""
        return self._step_planar(state, (iq.real, iq.imag))

    def _front(self, state: dict, x, dc_mean=None, x_rows=None):
        """DC removal + every group's full-rate mix + half-band cascade.

        ``x`` is the planar ``(re, im)`` input pair.  ``dc_mean`` non-None
        means the entry already fused ingest+DC (``_step_u8``'s i8 kernel):
        ``x`` is post-DC and ``dc_mean`` is the new carried mean.
        ``x_rows`` (optional) is the same signal as ``([T/256, 256],
        [T/256, 256])`` row planes — the layout the Pallas kernels tile
        on; when present the kernel inputs are built in row space so no
        1-D<->rows layout conversion happens at the pallas boundaries.
        Returns ``(partial new_state, post-DC planar x, {gk: (zr, zi)
        [1, Tg]})``.  ``ShardedReceiver`` overrides this with a shard_map
        over the time mesh axis; the bucket back half below is shared."""
        plan = self.plan
        new_state: dict[str, Any] = {}
        if dc_mean is not None:
            new_state["dc"] = dc_mean
        elif plan.dc_correct and self._dc_kernel is not None:
            # fused Pallas DC: one HBM read+write instead of the XLA
            # closed-form's several passes (pallas/dckernel.py)
            new_state["dc"], x = self._dc_kernel(state["dc"], x)
        elif plan.dc_correct:
            new_state["dc"], x = dc.dc_block_planar(state["dc"], x)
        else:
            new_state["dc"] = state["dc"]
        xr, xi = x
        zs: dict[str, tuple[jax.Array, jax.Array]] = {}
        zs_rows: dict[int, tuple[jax.Array, jax.Array]] = {}
        merged_z: dict[int, tuple[jax.Array, jax.Array]] = {}
        merged_warm = None
        if self._front_merged is not None:
            # ONE stateless kernel for all group fronts (see _build_consts)
            kern, mwarm, gidxs = self._front_merged
            xt = state["xtail"]
            phases = jnp.concatenate(
                [state[f"g{i}"]["nco"]["phase"] for i in gidxs]
            )
            ph = kern.phase_back(phases, mwarm)
            # the kernel input tail == x's tail (mwarm <= block): the
            # per-group tail derivations below read x directly
            merged_warm = mwarm
            if x_rows is not None:
                ext_r3, ext_i3 = self._rows_ext(
                    xt[0, -mwarm:], xt[1, -mwarm:], x_rows
                )
                o3r, o3i = kern(ph, ext_r3, ext_i3)
            else:
                mext_r = jnp.concatenate([xt[0, -mwarm:], xr])
                mext_i = jnp.concatenate([xt[1, -mwarm:], xi])
                o3r, o3i = kern(ph, mext_r[None, :], mext_i[None, :])
            by_index = {g.index: g for g in plan.groups}
            for ci, gi in enumerate(gidxs):
                gm = by_index[gi]
                l_c = kern.lanes >> gm.stages
                drop = mwarm >> gm.stages
                fr = o3r[ci, :, :l_c].reshape(-1)[drop:]
                fi = o3i[ci, :, :l_c].reshape(-1)[drop:]
                merged_z[gi] = (fr[None, :], fi[None, :])
                if x_rows is not None and fr.shape[0] % 256 == 0:
                    # group-rate ROW planes for the bucket kernels (one
                    # relayout here instead of one per bucket pallas
                    # boundary)
                    zs_rows[gi] = (
                        fr.reshape(-1, 256), fi.reshape(-1, 256)
                    )
        for g in plan.groups:
            gk = f"g{g.index}"
            gs = state[gk]
            ngs: dict[str, Any] = {}
            if g.direct:
                zs[gk] = (xr[None, :], xi[None, :])
            elif g.index in merged_z:
                zs[gk] = merged_z[g.index]
                ngs["nco"] = dict(gs["nco"])
                ngs["nco"]["phase"] = nco.advance_per_block(
                    gs["nco"], plan.fs, self.block
                )
                mwarm = merged_warm
                tail = (xr[-mwarm:], xi[-mwarm:])
                tph = nco.phase_minus(ngs["nco"], plan.fs, mwarm)
                tst = dict(gs["nco"])
                tst["phase"] = tph
                _, ztail = nco.mix_block_planar(tst, tail, plan.fs)
                ngs["cascade"] = halfband.cascade_tails_from_tail(
                    ztail, self._consts[f"{gk}/hb"], g.stages
                )
            elif gk in self._kernels:
                # stateless composite kernel: prepend the carried xtail's
                # last warmup samples, start the in-kernel NCO at the
                # prefix's phase, drop the warm-up outputs
                kern, warm = self._kernels[gk]
                xt = state["xtail"]
                ph = nco.phase_minus(gs["nco"], plan.fs, warm)
                if x_rows is not None:
                    yr, yi = kern(
                        ph,
                        *self._rows_ext(xt[0, -warm:], xt[1, -warm:], x_rows),
                    )
                else:
                    ext_r = jnp.concatenate([xt[0, -warm:], xr])
                    ext_i = jnp.concatenate([xt[1, -warm:], xi])
                    yr, yi = kern(ph, ext_r[None, :], ext_i[None, :])
                drop = warm >> g.stages
                zs[gk] = (yr[:, drop:], yi[:, drop:])
                if x_rows is not None and (yr.shape[1] - drop) % 256 == 0:
                    zs_rows[g.index] = (
                        yr[0, drop:].reshape(-1, 256),
                        yi[0, drop:].reshape(-1, 256),
                    )
                ngs["nco"] = dict(gs["nco"])
                ngs["nco"]["phase"] = nco.advance_per_block(
                    gs["nco"], plan.fs, self.block
                )
                # canonical cascade histories re-derived from the block's
                # mixed tail (exact by washout; keeps state mode-portable);
                # the kernel-input tail == x's tail since warm <= block
                tail = (xr[-warm:], xi[-warm:])
                tph = nco.phase_minus(ngs["nco"], plan.fs, warm)
                tst = dict(gs["nco"])
                tst["phase"] = tph
                _, ztail = nco.mix_block_planar(tst, tail, plan.fs)
                ngs["cascade"] = halfband.cascade_tails_from_tail(
                    ztail, self._consts[f"{gk}/hb"][:1], g.stages
                )
            else:
                ngs["nco"], z = nco.mix_block_planar(gs["nco"], x, plan.fs)
                ngs["cascade"], z = halfband.cascade_apply_planar(
                    gs["cascade"], z, self._consts[f"{gk}/hb"]
                )
                zs[gk] = z
            new_state[gk] = ngs
        for gi, pair in zs_rows.items():
            # group-rate ROW planes for the bucket kernels, keyed apart
            # from the group entries (consumed by _step_planar only)
            zs[f"rows/g{gi}"] = pair
        return new_state, x, zs

    def _constrain_chan(self, y: jax.Array, channels: int) -> jax.Array:
        """Hook: ShardedReceiver pins bucket tensors to the chan mesh axis."""
        return y

    def _prev_group_tail(self, state: dict, g, n_out: int):
        """Last ``n_out`` group-rate samples of the PREVIOUS block's group
        output, re-derived from the carried xtail — the warm-up prefix for
        this block's bucket kernels.

        Direct groups: the group "output" IS the post-DC input stream, so
        the tail is the raw carried xtail.  Mix-only groups (stages == 0):
        mix the xtail's last ``n_out`` samples at the analytically rewound
        phase.  Cascaded groups (all washout-exact): take the last
        ``n_out * 2^stages + warmup`` input samples (the xtail is sized to
        cover this), mix them at the rewound phase, run a ZERO-state jnp
        cascade, and keep the last ``n_out`` outputs — the zero state
        washes out inside the extra warmup samples."""
        from ..kernels import halfband as hb_mod
        from ..pallas.frontend import warmup_len

        xt = state["xtail"]
        if g.direct:
            return xt[0, -n_out:][None, :], xt[1, -n_out:][None, :]
        gs = state[f"g{g.index}"]
        if g.stages == 0:
            tst = dict(gs["nco"])
            tst["phase"] = nco.phase_minus(gs["nco"], self.plan.fs, n_out)
            _, z = nco.mix_block_planar(
                tst, (xt[0, -n_out:], xt[1, -n_out:]), self.plan.fs
            )
            return z[0], z[1]
        wg = warmup_len(g.stages)
        need = n_out * (1 << g.stages) + wg
        tst = dict(gs["nco"])
        tst["phase"] = nco.phase_minus(gs["nco"], self.plan.fs, need)
        _, zmix = nco.mix_block_planar(
            tst, (xt[0, -need:], xt[1, -need:]), self.plan.fs
        )
        _, z = hb_mod.cascade_apply_planar(
            hb_mod.cascade_init_planar(1, g.stages),
            zmix,
            self._consts[f"g{g.index}/hb"],
        )
        return z[0][:, -n_out:], z[1][:, -n_out:]

    def _bucket_step(
        self,
        g,
        bi: int,
        bs: dict,
        z,
        outputs: dict[str, jax.Array],
        state: dict | None = None,
        z_rows=None,
    ) -> dict:
        """One sub-VFO bucket's full pipeline on the planar group baseband
        ``z = (zr, zi)`` ``[1, Tg]``: mix, half-band cascade, per-channel
        scope taps, late ÷5/÷6, USB demod, audio low-pass (direct or
        overlap-save FFT), int16 quantize.  Shared verbatim by the
        single-device and sharded receivers so the two can never diverge in
        features again."""
        b = g.buckets[bi]
        bk = f"g{g.index}/b{bi}"
        zr, zi = z
        nbs: dict[str, Any] = {}
        if bk in self._kernels:
            kern, warm = self._kernels[bk]
            fs_b = b.mix_fs(g.out_rate)
            # warm-up prefix = previous block's group output tail,
            # re-derived from the carried xtail (state stays canonical)
            ztr, zti = self._prev_group_tail(state, g, warm)
            ph = nco.phase_minus(bs["nco"], fs_b, warm)
            if z_rows is not None and warm % 256 == 0:
                # group output already in ROW planes (see _front)
                yr, yi = kern(ph, *self._rows_ext(ztr, zti, z_rows))
            else:
                ext_r = jnp.concatenate([ztr, zr], axis=-1)
                ext_i = jnp.concatenate([zti, zi], axis=-1)
                yr, yi = kern(ph, ext_r, ext_i)
            drop = warm >> b.stages
            y = (yr[:, drop:], yi[:, drop:])
            nbs["nco"] = dict(bs["nco"])
            nbs["nco"]["phase"] = nco.advance_per_block(
                bs["nco"], fs_b, zr.shape[-1]
            )
            # canonical bucket cascade histories from the mixed tail
            # (the kernel-input tail == the group output's tail, since
            # warm <= Tg)
            nst = dict(nbs["nco"])
            nst["phase"] = nco.phase_minus(nbs["nco"], fs_b, warm)
            _, ztail = nco.mix_block_planar(
                nst, (zr[0, -warm:], zi[0, -warm:]), fs_b
            )
            nbs["cascade"] = halfband.cascade_tails_from_tail(
                ztail, self._consts[f"{bk}/hb"], b.stages
            )
        else:
            nbs["nco"], y = nco.mix_block_planar(
                bs["nco"], (zr[0], zi[0]), b.mix_fs(g.out_rate)
            )
            y = (
                self._constrain_chan(y[0], b.channels),
                self._constrain_chan(y[1], b.channels),
            )
            nbs["cascade"], y = halfband.cascade_apply_planar(
                bs["cascade"], y, self._consts[f"{bk}/hb"]
            )
        for ci, s in enumerate(b.subs):
            # per-channel scope: decimated pre-demod baseband, same
            # point the reference's per-VFO FFT taps (vfo.cpp:290-295,
            # before usb_decimdemod's late ÷5/÷6)
            if s.topic in self.emit_taps:
                outputs[f"tap/{s.topic}"] = self._tap((y[0][ci], y[1][ci]))
        if b.late_factor > 1:
            nbs["late"], y = fir.conv_block_planar(
                bs["late"], y, self._consts[f"{bk}/late"], b.late_factor
            )
        nbs["usb"], audio = usbdemod.usb_block_planar(
            bs["usb"], y, self._consts[f"{bk}/hilbert"]
        )
        if f"{bk}/audio_oss" in self._consts:
            # long filters: overlap-save FFT convolution engine
            nbs["audio"], audio = ossfft.oss_block(
                bs["audio"], audio, self._consts[f"{bk}/audio_oss"]
            )
            audio = audio.real
        elif f"{bk}/audio" in self._consts:
            nbs["audio"], audio = fir.conv_block(
                bs["audio"], audio, self._consts[f"{bk}/audio"]
            )
        pcm = usbdemod.quantize_i16(audio, self._consts[f"{bk}/gains"])
        # ONE flat int16 output per bucket: emitting 27 row-sliced (or 2-D)
        # int16 outputs costs ~90 us/step of pure layout work on TPU
        # (measured round 3, PARITY.md); the flat [C*Ta] form is free and
        # split_audio() recovers per-topic rows as zero-copy host views
        outputs[f"pcm/{bk}"] = pcm.reshape(-1)
        return nbs

    def _step_planar(self, state: dict, x, dc_mean=None, x_rows=None):
        plan = self.plan
        outputs: dict[str, jax.Array] = {}

        new_state, x, zs = self._front(
            state, x, dc_mean=dc_mean, x_rows=x_rows
        )
        if self.xtail_len():
            p = self.xtail_len()
            new_state["xtail"] = jnp.stack([x[0][-p:], x[1][-p:]])
        if "main" in self.emit_taps:
            outputs["tap/main"] = self._tap(x)

        for g in plan.groups:
            gk = f"g{g.index}"
            gs = state[gk]
            ngs = new_state[gk]
            z = zs[gk]
            if gk in self.emit_taps:
                outputs[f"tap/{gk}"] = self._tap((z[0][0], z[1][0]))
            if g.publishes_iq:
                outputs[f"iq/{g.zmq_topic}"] = compress.compress_style1_planar(
                    (z[0][0], z[1][0]), float(g.compress_scale)
                )
            for bi in range(len(g.buckets)):
                ngs[f"b{bi}"] = self._bucket_step(
                    g, bi, gs[f"b{bi}"], z, outputs, state=state,
                    z_rows=zs.get(f"rows/{gk}"),
                )
        return new_state, outputs

    # ---------------------------------------------------- state portability
    @staticmethod
    def _is_planar_pair(key: str) -> bool:
        """State paths stored internally as planar ``[2, ...]`` f32 planes
        whose CANONICAL (checkpoint) form is complex: the DC mean, cascade
        stage histories, and late-decimator histories."""
        leaf = key.rsplit("/", 1)[-1]
        return key in ("dc", "xtail") or leaf == "late" or (
            "/cascade/" in key and leaf.isdigit()
        )

    def export_state(self, vec) -> dict:
        """Packed state vector -> named host leaves in the CANONICAL layout
        (complex histories — stable across rounds): every execution mode
        carries the same per-stage-history state (the stateless Pallas
        kernels re-derive it each block, see _init_state), so this is a
        pure planar->complex re-view and a checkpoint taken in any mode
        loads into any other (jnp / Pallas / sharded)."""
        named = self._svec.export_named(vec)
        out: dict[str, np.ndarray] = {}
        for k, v in named.items():
            if self._is_planar_pair(k):
                out[k] = (v[0] + 1j * v[1]).astype(np.complex64)
            else:
                out[k] = v
        return out

    def import_state(self, named: dict) -> jax.Array:
        """Named canonical leaves -> packed state vector on device.

        The inverse of :meth:`export_state` for THIS receiver's execution
        mode; fails with the offending path on any mismatch."""
        conv = dict(named)
        if "xtail" not in conv and self.xtail_len():
            # checkpoints from before the xtail leaf existed: resume with a
            # zero tail — only effect is a <= xtail_len-sample warm-up
            # transient in the first block of any Pallas-mode front (the
            # single-chip merged/group kernels, the bucket kernels and the
            # sharded shard-0 halo all read it)
            conv["xtail"] = np.zeros(self.xtail_len(), np.complex64)
        elif "xtail" in conv and self.xtail_len():
            # xtail length depends on block size via pick_warmup, so a
            # checkpoint from a receiver with a different block rounding may
            # carry a different tail length.  Left-pad with zeros / trim to
            # the leading samples' loss — the cost is only a bounded
            # (<= xtail_len) warm-up transient, same as the missing-leaf
            # fallback, not an error.
            h = np.asarray(conv["xtail"])
            want = self.xtail_len()
            if h.shape[-1] != want:
                if h.shape[-1] > want:
                    h = h[..., -want:]
                else:
                    pad = np.zeros(want - h.shape[-1], h.dtype)
                    h = np.concatenate([pad, h])
                conv["xtail"] = h
        for key, shape, dtype, off, store in self._svec.spec:
            if self._is_planar_pair(key) and key in conv:
                h = np.asarray(conv[key])
                want = shape[1:]
                if h.shape != want:
                    raise ValueError(
                        f"checkpoint entry {key!r} has shape {h.shape}, "
                        f"expected {want}"
                    )
                conv[key] = np.stack(
                    [h.real, h.imag]
                ).astype(np.float32)
        return jax.device_put(self._svec.import_named(conv))

    # -------------------------------------------------------------- outputs
    def split_audio(self, outputs: dict) -> dict:
        """Expand packed ``pcm/g<i>/b<j>`` buffers into per-channel
        ``audio/<topic>`` rows (zero-copy slices on host numpy arrays).

        Accepts the raw output dict of one step — host-fetched (numpy) or
        still on device — and returns the public output dict; non-pcm keys
        (taps, iq) pass through untouched.  Keys absent from ``outputs``
        (e.g. dropped by a fetch filter) are skipped."""
        out = {k: v for k, v in outputs.items() if not k.startswith("pcm/")}
        for g in self.plan.groups:
            tg = self.block >> g.stages
            for bi, b in enumerate(g.buckets):
                flat = outputs.get(f"pcm/g{g.index}/b{bi}")
                if flat is None:
                    continue
                ta = (tg >> b.stages) // b.late_factor
                for ci, s in enumerate(b.subs):
                    out[f"audio/{s.topic}"] = flat[ci * ta : (ci + 1) * ta]
        return out

    @staticmethod
    def unstack_outputs(outputs: dict, k: int) -> list[dict]:
        """Burst (``step_many_*``) outputs -> k per-block output dicts
        (zero-copy views along the stacked leading axis), each in the exact
        form a single step emits — feed them to :meth:`split_audio`."""
        return [{key: v[i] for key, v in outputs.items()} for i in range(k)]

    # ------------------------------------------------------------- metadata
    def tap_rates(self) -> dict[str, int]:
        """Valid scope tap name -> its sample rate: "main" (input rate),
        "g<i>" (group output rate), or a sub-VFO topic (that channel's
        pre-demod rate, i.e. bucket rate before the late ÷5/÷6 stage)."""
        r: dict[str, int] = {"main": self.plan.fs}
        for g in self.plan.groups:
            r[f"g{g.index}"] = g.out_rate
        seen_topics: set[str] = set()
        for g in self.plan.groups:
            for b in g.buckets:
                for s in b.subs:
                    if s.topic in seen_topics:
                        # two channels with one topic: their audio/<topic>
                        # dict outputs would silently shadow each other (the
                        # reference interleaves both channels' ZMQ frames on
                        # that topic — a dict-keyed step cannot express that)
                        raise ValueError(
                            f"duplicate sub-VFO topic {s.topic!r}: each "
                            f"channel needs a unique topic — its "
                            f"audio/{s.topic} output (and scope tap) would "
                            f"shadow the other channel's"
                        )
                    if s.topic in r:
                        # a topic literally named "main"/"g<i>" would shadow
                        # a built-in tap's rate AND its tap/<name> output key
                        # — the scope would show the wrong signal silently
                        raise ValueError(
                            f"scope tap name collision: sub-VFO topic "
                            f"{s.topic!r} clashes with the built-in "
                            f"{s.topic!r} tap (reserved names: 'main', "
                            f"'g<i>')"
                        )
                    seen_topics.add(s.topic)
                    r[s.topic] = b.out_rate * b.late_factor
        return r

    def rates(self) -> dict[str, int]:
        """Output key -> sample rate (the ZMQ wire rate field)."""
        r: dict[str, int] = {}
        for g in self.plan.groups:
            if g.publishes_iq:
                r[f"iq/{g.zmq_topic}"] = g.out_rate
            for b in g.buckets:
                for s in b.subs:
                    r[f"audio/{s.topic}"] = b.out_rate
        return r

    def output_shapes(self) -> dict[str, tuple[int, ...]]:
        """Public (post-:meth:`split_audio`) output key -> shape."""
        shapes: dict[str, tuple[int, ...]] = {}
        for g in self.plan.groups:
            tg = self.block >> g.stages
            if g.publishes_iq:
                shapes[f"iq/{g.zmq_topic}"] = (tg,)
            for b in g.buckets:
                ta = (tg >> b.stages) // b.late_factor
                for s in b.subs:
                    shapes[f"audio/{s.topic}"] = (ta,)
        return shapes


def compile_plan(
    plan: ReceiverPlan,
    block_samples: int | None = None,
    emit_taps: tuple[str, ...] = (),
) -> CompiledReceiver:
    return CompiledReceiver(plan, block_samples, emit_taps=emit_taps)
