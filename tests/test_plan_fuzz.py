"""Config-space fuzz: random valid plans through BOTH execution modes.

The round-4 advisor's high-severity finding (Pallas bucket warm-up crash
for direct / stages==0 groups) lived in a config-space corner no
hand-written test covered.  This sweep generates seeded-random receiver
configs across the planner's axes — sample rate (288k/1.536M/1.92M), main
out_rates (incl. mix-only fs==out and the late-/5//6 rates), matched and
unmatched subs, data_rate vs explicit out_rate, filters on/off — and
checks, for each:

  * the plan builds and both receivers compile (jnp and Pallas-interpret)
  * one u8 block produces identical output KEYS and <=1-LSB-equal audio
  * a second block continues the stream (streaming state exercised)

Shapes are kept small so the whole sweep stays a few seconds per config.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from sdrreceiver_tpu.graph import build_plan, parse_ini_text
from sdrreceiver_tpu.graph.compiler import CompiledReceiver


def _random_ini(rng: np.random.Generator) -> str:
    fs = int(rng.choice([288000, 1536000, 1920000]))
    center = 1545600000
    # main out_rate: a power-of-two divisor of fs (incl. fs itself ->
    # mix-only group) or the late-decimation rates the planner special-cases
    if fs == 1920000:
        main_rates = [240000, 480000, 1920000]
    elif fs == 288000:
        main_rates = [288000, 144000, 72000]
    else:
        main_rates = [1536000, 384000, 192000, 96000]
    n_mains = int(rng.integers(1, 4))
    mains = []
    for i in range(n_mains):
        mains.append((center - 500000 + 450000 * i,
                      int(rng.choice(main_rates))))
    lines = [
        f"sample_rate={fs}",
        f"center_frequency={center}",
        "zmq_address=tcp://*:6003",
        f"correct_dc_bias={int(rng.integers(0, 2))}",
        "[main_vfos]",
        f"size={n_mains}",
    ]
    for i, (f, r) in enumerate(mains, 1):
        lines += [f"{i}\\frequency={f}", f"{i}\\out_rate={r}"]
    n_subs = int(rng.integers(1, 6))
    lines += ["[vfos]", f"size={n_subs}"]
    for i in range(1, n_subs + 1):
        if rng.random() < 0.85:  # matched to some main
            mf, mr = mains[int(rng.integers(0, n_mains))]
            freq = mf + int(rng.integers(-mr // 3, mr // 3))
        else:  # deliberately unmatched -> direct group
            freq = center + 14000000 + 9000 * i
        lines += [f"{i}\\frequency={freq}", f"{i}\\gain=5"]
        # rate selection must compose with the group chain; data_rate's
        # 12k/24k/48k table works for every fs the reference supports
        if rng.random() < 0.5:
            lines.append(
                f"{i}\\data_rate={int(rng.choice([600, 1200, 10500]))}"
            )
        else:
            lines.append(f"{i}\\out_rate={int(rng.choice([12000, 48000]))}")
        if rng.random() < 0.4:
            lines.append(f"{i}\\filter_bandwidth={int(rng.choice([3000, 4000]))}")
        lines.append(f"{i}\\topic=FZ{i:03d}")
    return "\n".join(lines)


@pytest.mark.parametrize("seed", range(8))
def test_random_plan_pallas_matches_jnp(seed):
    rng = np.random.default_rng(1000 + seed)
    ini = _random_ini(rng)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            plan = build_plan(parse_ini_text(ini))
        except ValueError:
            # planner rejects non-composing rate chains loudly — that IS
            # the contract; nothing further to check for this draw
            return
    # small block: a few multiples of the divisor, 512-aligned for the
    # u8 rows path when possible
    div = int(np.lcm(plan.block_divisor(), 256))
    block = div
    while block < 8192:
        block += div
    rx_ref = CompiledReceiver(plan, block)
    rx_pal = CompiledReceiver(plan, block, use_pallas=True,
                              pallas_interpret=True)
    raw = jnp.asarray(
        rng.integers(0, 256, (2, 2 * block)).astype(np.uint8)
    )
    sr, sp = rx_ref.init_state(), rx_pal.init_state()
    for i in range(2):
        sr, oref = rx_ref.step_u8(sr, raw[i])
        sp, opal = rx_pal.step_u8(sp, raw[i])
        assert set(oref) == set(opal), ini
        for k in oref:
            d = np.abs(
                np.asarray(opal[k]).astype(np.int32)
                - np.asarray(oref[k]).astype(np.int32)
            )
            assert d.max() <= 1, (seed, k, i, int(d.max()), ini)


@pytest.mark.parametrize("seed", range(4))
def test_random_plan_sharded_matches_unsharded(seed):
    """Random plans through ShardedReceiver on a random (time, chan) mesh:
    sharded == single-device for config corners (direct groups, mix-only
    mains, late /5//6) that the hand-written dist tests don't draw."""
    import jax

    from sdrreceiver_tpu.dist import ShardedReceiver, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(2000 + seed)
    ini = _random_ini(rng)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        try:
            plan = build_plan(parse_ini_text(ini))
        except ValueError:
            return
    n_time, n_chan = [(8, 1), (4, 2), (2, 4), (2, 2)][int(rng.integers(0, 4))]
    div = plan.block_divisor() * n_time
    block = div
    while block < 4096:
        block += div
    rx_ref = CompiledReceiver(plan, block)
    mesh = make_mesh(n_time=n_time, n_chan=n_chan,
                     devices=jax.devices()[: n_time * n_chan])
    rx_sh = ShardedReceiver(plan, mesh, block)
    iq = jnp.asarray(
        (rng.standard_normal(2 * block) + 1j * rng.standard_normal(2 * block))
        .astype(np.complex64)
    )
    sr, ss = rx_ref.init_state(), rx_sh.init_state()
    for i in range(2):
        chunk = iq[i * block : (i + 1) * block]
        sr, oref = rx_ref.step_iq(sr, chunk)
        ss, osh = rx_sh.step_iq(ss, chunk)
        assert set(oref) == set(osh), ini
        for k in oref:
            a = np.asarray(osh[k])
            b = np.asarray(oref[k])
            if k.startswith("iq/"):
                np.testing.assert_array_equal(a, b, err_msg=f"{seed} {k}")
                continue
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, (seed, k, i, int(d.max()), ini)
