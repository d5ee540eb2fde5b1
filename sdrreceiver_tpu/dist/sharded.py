"""ShardedReceiver: the compiled receiver over a ``(time, chan)`` device mesh.

Front end (DC + per-group mix + half-band cascade, running at the full input
rate) executes under ``jax.shard_map`` across the ``time`` axis with explicit
ppermute halo exchange of FIR history and analytic NCO phase offsets
(dist.halo).  Bucket pipelines (sub-VFO mix/decimate/demod, running at <=1/4
rate but wide in channels) are sharded across the ``chan`` axis via
``with_sharding_constraint`` — XLA's SPMD partitioner splits the grouped
convolutions by feature group and inserts any needed collectives.

Sharded output == single-device output bit-for-bit (tested in
tests/test_dist.py); the mesh only changes where the FLOPs run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..graph.compiler import CompiledReceiver
from ..graph.plan import ReceiverPlan
from ..kernels import compress, dc, fir, halfband, nco, usbdemod
from . import halo
from .mesh import CHAN_AXIS, TIME_AXIS

__all__ = ["ShardedReceiver"]


class ShardedReceiver(CompiledReceiver):
    def __init__(
        self,
        plan: ReceiverPlan,
        mesh: jax.sharding.Mesh,
        block_samples: int | None = None,
    ):
        self.mesh = mesh
        if TIME_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh needs a {TIME_AXIS!r} axis")
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_chan = mesh.shape.get(CHAN_AXIS, 1)
        super().__init__(plan, block_samples)
        need = plan.block_divisor() * self.n_time
        if self.block % need:
            raise ValueError(
                f"block of {self.block} samples must be a multiple of "
                f"divisor*n_time = {need}"
            )

    # -- front end under shard_map ------------------------------------------
    def _front_end(self, front_state: dict, x: jax.Array):
        plan = self.plan
        t_local = self.block // self.n_time

        def local_fn(st: dict, x_local: jax.Array):
            new_st: dict = {}
            if plan.dc_correct:
                new_st["dc"], y = halo.timeshard_dc_local(
                    st["dc"], x_local, TIME_AXIS
                )
            else:
                new_st["dc"], y = st["dc"], x_local
            zs: dict[str, jax.Array] = {}
            for g in plan.groups:
                gk = f"g{g.index}"
                if g.direct:
                    zs[gk] = y[None, :]
                    new_st[gk] = st[gk]
                    continue
                gs = st[gk]
                nco_state, z = halo.timeshard_mix_local(
                    gs["nco"], y, plan.fs, t_local, TIME_AXIS
                )
                hists, z = halo.timeshard_cascade_local(
                    gs["cascade"], z, self._consts[f"{gk}/hb"], TIME_AXIS
                )
                new_st[gk] = {"nco": nco_state, "cascade": hists}
                zs[gk] = z
            return new_st, zs

        zs_specs = {f"g{g.index}": P(None, TIME_AXIS) for g in self.plan.groups}
        return jax.shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(TIME_AXIS)),
            out_specs=(P(), zs_specs),
            check_vma=False,
        )(front_state, x)

    # -- full step ----------------------------------------------------------
    def _step_iq(self, state: dict, iq: jax.Array):
        plan = self.plan
        outputs: dict[str, jax.Array] = {}

        front_state = {"dc": state["dc"]}
        for g in plan.groups:
            gk = f"g{g.index}"
            if g.direct:
                front_state[gk] = {}
            else:
                front_state[gk] = {
                    "nco": state[gk]["nco"],
                    "cascade": state[gk]["cascade"],
                }

        iq = jax.lax.with_sharding_constraint(
            iq, NamedSharding(self.mesh, P(TIME_AXIS))
        )
        new_front, zs = self._front_end(front_state, iq)

        new_state: dict = {"dc": new_front["dc"]}
        chan_spec = (
            P(CHAN_AXIS, None) if CHAN_AXIS in self.mesh.axis_names else None
        )

        for g in plan.groups:
            gk = f"g{g.index}"
            gs = state[gk]
            ngs: dict = dict(new_front[gk]) if not g.direct else {}
            z = zs[gk]
            if g.publishes_iq:
                outputs[f"iq/{g.zmq_topic}"] = compress.compress_style1(
                    z[0], float(g.compress_scale)
                )
            for bi, b in enumerate(g.buckets):
                bk = f"{gk}/b{bi}"
                bs = gs[f"b{bi}"]
                nbs: dict = {}
                nbs["nco"], y = nco.mix_block(bs["nco"], z[0], g.out_rate)
                if chan_spec is not None and b.channels >= self.n_chan:
                    y = jax.lax.with_sharding_constraint(
                        y, NamedSharding(self.mesh, chan_spec)
                    )
                nbs["cascade"], y = halfband.cascade_apply(
                    bs["cascade"], y, self._consts[f"{bk}/hb"]
                )
                if b.late_factor > 1:
                    nbs["late"], y = fir.conv_block(
                        bs["late"], y, self._consts[f"{bk}/late"], b.late_factor
                    )
                nbs["usb"], audio = usbdemod.usb_block(
                    bs["usb"], y, self._consts[f"{bk}/hilbert"]
                )
                if f"{bk}/audio" in self._consts:
                    nbs["audio"], audio = fir.conv_block(
                        bs["audio"], audio, self._consts[f"{bk}/audio"]
                    )
                pcm = usbdemod.quantize_i16(audio, self._consts[f"{bk}/gains"])
                for ci, s in enumerate(b.subs):
                    outputs[f"audio/{s.topic}"] = pcm[ci]
                ngs[f"b{bi}"] = nbs
            new_state[gk] = ngs
        return new_state, outputs
