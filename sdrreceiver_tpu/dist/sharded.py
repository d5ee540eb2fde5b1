"""ShardedReceiver: the compiled receiver over a ``(time, chan)`` device mesh.

Front end (DC + per-group mix + half-band cascade, running at the full input
rate) executes under ``jax.shard_map`` across the ``time`` axis with explicit
ppermute halo exchange of FIR history and analytic NCO phase offsets
(dist.halo).  Bucket pipelines (sub-VFO mix/decimate/demod, running at <=1/4
rate but wide in channels) are sharded across the ``chan`` axis via
``with_sharding_constraint`` — XLA's SPMD partitioner splits the grouped
convolutions by feature group and inserts any needed collectives.

The bucket back half is CompiledReceiver._bucket_step verbatim — scope taps,
late ÷5/÷6, USB demod, direct or overlap-save-FFT audio filtering and int16
quantization are the same code object in both execution modes, so sharded
runs carry the full feature surface (emit_taps, ossfft) by construction.

Sharded output == single-device output bit-for-bit (tested in
tests/test_dist.py); the mesh only changes where the FLOPs run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..graph.compiler import CompiledReceiver
from ..graph.plan import ReceiverPlan
from . import halo
from .mesh import CHAN_AXIS, TIME_AXIS

__all__ = ["ShardedReceiver"]


class ShardedReceiver(CompiledReceiver):
    def __init__(
        self,
        plan: ReceiverPlan,
        mesh: jax.sharding.Mesh,
        block_samples: int | None = None,
        **kwargs,
    ):
        """Accepts every CompiledReceiver option (``emit_taps``,
        ``ossfft_min_taps``, ``tap_samples``, ...).

        ``use_pallas`` runs each GROUP's fused mix+cascade Pallas kernel
        per-shard inside the shard_map (no SPMD partitioning rule needed:
        every shard prepends a ``warmup_len`` input halo from its left
        neighbor — shard 0 reads the carried ``xtail`` state — runs the
        kernel with zero stage tails, and drops the warm-up outputs, which
        are exactly the samples the halo determines).  Groups whose shard
        shapes the kernel does not support fall back to the jnp halo path
        per group; bucket pipelines stay on the XLA path (sharded over the
        chan axis by the SPMD partitioner)."""
        self.mesh = mesh
        if TIME_AXIS not in mesh.axis_names:
            raise ValueError(f"mesh needs a {TIME_AXIS!r} axis")
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_chan = mesh.shape.get(CHAN_AXIS, 1)
        # mesh spanning several processes (multihost global mode): outputs
        # must be pinned fully-replicated so every host can fetch them (the
        # DCN gather is ~MB/block), and state/input arrays must be built as
        # global arrays (see globalize/init_state)
        self._multiprocess = any(
            d.process_index != jax.process_index() for d in mesh.devices.flat
        )
        self._shard_kernels: dict[str, tuple] = {}
        super().__init__(plan, block_samples, **kwargs)
        need = plan.block_divisor() * self.n_time
        if self.block % need:
            raise ValueError(
                f"block of {self.block} samples must be a multiple of "
                f"divisor*n_time = {need}"
            )
        if self.use_pallas:
            self._build_shard_kernels()

    def _fused(self, key, channels, stages, fs, freqs, t_len, shared_input=False):
        """Base-class fused kernels never engage under a mesh: the front is
        replaced by the per-shard kernels below, and a pallas_call inside
        the SPMD-partitioned bucket path would be gathered onto one device."""
        return None

    def _want_dc_kernel(self) -> bool:
        return False  # time shards use the halo DC path (dist/halo)

    def _want_merged_front(self) -> bool:
        return False  # per-shard kernels are built in _build_shard_kernels

    def _build_shard_kernels(self) -> None:
        from ..pallas.frontend import MixCascadeKernel, pick_warmup, supported

        t_local = self.block // self.n_time
        for g in self.plan.groups:
            if g.direct or g.stages < 1:
                continue
            p = pick_warmup(g.stages, t_local, self.plan.fs)
            if t_local < p or p > self.xtail_len() or not supported(
                self.plan.fs, g.stages, t_local + p
            ):
                continue  # (xtail must cover shard 0's halo slice)
            kern = MixCascadeKernel(
                1,
                g.stages,
                self.plan.fs,
                np.asarray([g.mixer_freq], dtype=np.int64),
                t_local + p,
                interpret=self.pallas_interpret,
            )
            self._shard_kernels[f"g{g.index}"] = (kern, p)

    # -- state boundary: pin everything replicated ---------------------------
    def _vec(self, step):
        """Packed-state wrapper with explicit replication constraints.

        The packed vector concatenates shard_map outputs (replicated by
        construction via halo collectives) with chan-sharded bucket
        histories.  Without pinning, XLA's sharding propagation pushes a
        chan partition back through the concat INTO the ``check_vma=False``
        shard_map outputs, which mis-partitions the whole front (observed:
        garbage on (time, chan) meshes with n_chan > 1).  Constraining every
        state leaf and the packed vector to fully-replicated keeps the
        propagation out; the forced all-gathers move only the ~100 KB
        state."""
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(self.mesh, PartitionSpec())

        def pin(tree):
            return jax.tree.map(
                lambda l: jax.lax.with_sharding_constraint(l, repl), tree
            )

        def wrapped(vec, block):
            state = self._svec.unpack(
                jax.lax.with_sharding_constraint(vec, repl)
            )
            new_state, outputs = step(state, block)
            out_vec = jax.lax.with_sharding_constraint(
                self._svec.pack(pin(new_state)), repl
            )
            if self._multiprocess:
                # every host fetches/publishes from the same replicated
                # outputs (per-host egress filtering happens host-side)
                outputs = pin(outputs)
            return out_vec, outputs

        return wrapped

    # -- multi-process plumbing ---------------------------------------------
    def globalize(self, x, spec=None):
        """Host-local array (same value on every process) -> global jax
        Array over this receiver's mesh.  ``spec``: PartitionSpec (default
        time-sharded along the last axis for data, use P() for state)."""
        import numpy as np
        from jax.sharding import PartitionSpec

        from .mesh import TIME_AXIS as _T

        if not self._multiprocess:
            return x
        x = np.asarray(x)
        sh = NamedSharding(
            self.mesh, spec if spec is not None else PartitionSpec(_T)
        )
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    def init_state(self) -> jax.Array:
        vec = super().init_state()
        if self._multiprocess:
            from jax.sharding import PartitionSpec

            return self.globalize(vec, PartitionSpec())
        return vec

    # -- front end under shard_map ------------------------------------------
    def _front(self, state: dict, x, dc_mean=None, x_rows=None):
        """Fully planar, boundary to internals: the halo kernels (dist.halo)
        operate on (re, im) f32 pairs / stacked [2, ...] planes inside the
        shard_map — no complex64 array exists anywhere in the sharded front
        (on a real TPU mesh complex64 lowers to minor-dim-2 layouts at
        10-50x roofline, the exact pathology the single-chip step eliminated
        in round 3; tools/layout_probe.py)."""
        # the fused ingest+DC entry never engages under a mesh
        # (_want_dc_kernel is False -> _dc_kernel_u8 is None)
        assert dc_mean is None
        plan = self.plan
        t_local = self.block // self.n_time

        front_state = {"dc": state["dc"]}
        if "xtail" in state:
            front_state["xtail"] = state["xtail"]
        for g in plan.groups:
            gk = f"g{g.index}"
            if g.direct:
                front_state[gk] = {}
            else:
                front_state[gk] = {
                    "nco": state[gk]["nco"],
                    "cascade": state[gk]["cascade"],
                }

        fs = plan.fs
        n_time = self.n_time

        def local_fn(st: dict, xr_local: jax.Array, xi_local: jax.Array):
            from ..kernels import nco as nco_mod

            x_local = (xr_local, xi_local)
            new_st: dict = {}
            if plan.dc_correct:
                new_st["dc"], y = halo.timeshard_dc_local(
                    st["dc"], x_local, TIME_AXIS
                )
            else:
                new_st["dc"], y = st["dc"], x_local
            if "xtail" in st:
                new_st["xtail"] = st["xtail"]  # replaced globally per block
            zs: dict[str, tuple[jax.Array, jax.Array]] = {}
            for g in plan.groups:
                gk = f"g{g.index}"
                if g.direct:
                    zs[gk] = (y[0][None, :], y[1][None, :])
                    new_st[gk] = st[gk]
                    continue
                gs = st[gk]
                if gk in self._shard_kernels:
                    # per-shard STATELESS fused Pallas front: each shard
                    # prepends a warmup_len halo (left neighbor's tail via
                    # ppermute; the carried xtail on shard 0), runs the
                    # composite kernel, and drops the warm-up outputs
                    # (pallas/frontend.py — same scheme as the single-chip
                    # path, so the two can't drift)
                    kern, p = self._shard_kernels[gk]
                    d = g.stages
                    idx = jax.lax.axis_index(TIME_AXIS)
                    y2 = jnp.stack(y)  # [2, T_local] planes
                    halo_p = halo.right_halo(y2, p, TIME_AXIS)
                    carried = st["xtail"][:, -p:]
                    left = jnp.where(idx == 0, carried, halo_p)
                    ext_r = jnp.concatenate([left[0], y[0]])
                    ext_i = jnp.concatenate([left[1], y[1]])
                    nco_state = gs["nco"]
                    step = nco_mod.block_step_mod(nco_state, fs, t_local)
                    pmod = nco_mod.block_step_mod(nco_state, fs, p)
                    iu = idx.astype(jnp.uint32)
                    ph = (
                        nco_state["phase"]
                        + (iu * step) % np.uint32(fs)
                        + (np.uint32(fs) - pmod)
                    ) % np.uint32(fs)
                    yr, yi = kern(ph, ext_r[None, :], ext_i[None, :])
                    zs[gk] = (yr[:, p >> d :], yi[:, p >> d :])
                    new_nco = dict(nco_state)
                    new_nco["phase"] = (
                        nco_state["phase"]
                        + (jnp.uint32(n_time) * step) % np.uint32(fs)
                    ) % np.uint32(fs)
                    # canonical cascade histories re-derived from the
                    # block's global mixed tail (washout-exact): last
                    # shard's local tail, broadcast, mixed at the rewound
                    # end phase
                    from ..kernels import halfband as hb_mod

                    tail2 = halo._bcast_from_last(y2[:, -p:], TIME_AXIS)
                    tst = dict(new_nco)
                    tst["phase"] = (
                        new_nco["phase"] + (np.uint32(fs) - pmod)
                    ) % np.uint32(fs)
                    _, ztail = nco_mod.mix_block_planar(
                        tst, (tail2[0], tail2[1]), fs
                    )
                    new_st[gk] = {
                        "nco": new_nco,
                        "cascade": hb_mod.cascade_tails_from_tail(
                            ztail, self._consts[f"{gk}/hb"], d
                        ),
                    }
                    continue
                nco_state, z = halo.timeshard_mix_local(
                    gs["nco"], y, plan.fs, t_local, TIME_AXIS
                )
                new_hists, z = halo.timeshard_cascade_local(
                    gs["cascade"], z, self._consts[f"{gk}/hb"], TIME_AXIS
                )
                new_st[gk] = {"nco": nco_state, "cascade": new_hists}
                zs[gk] = z
            return new_st, y, zs

        pz = P(None, TIME_AXIS)
        zs_specs = {f"g{g.index}": (pz, pz) for g in self.plan.groups}
        xr, xi = x
        tsh = NamedSharding(self.mesh, P(TIME_AXIS))
        xr = jax.lax.with_sharding_constraint(xr, tsh)
        xi = jax.lax.with_sharding_constraint(xi, tsh)
        new_front, x_out, zs = jax.shard_map(
            local_fn,
            mesh=self.mesh,
            in_specs=(P(), P(TIME_AXIS), P(TIME_AXIS)),
            out_specs=(P(), (P(TIME_AXIS), P(TIME_AXIS)), zs_specs),
            check_vma=False,
        )(front_state, xr, xi)
        return dict(new_front), x_out, zs

    # -- bucket hook: pin the channel axis to the chan mesh axis -------------
    def _constrain_chan(self, y: jax.Array, channels: int) -> jax.Array:
        if CHAN_AXIS in self.mesh.axis_names and channels >= self.n_chan:
            return jax.lax.with_sharding_constraint(
                y, NamedSharding(self.mesh, P(CHAN_AXIS, None))
            )
        return y
