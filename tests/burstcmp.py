"""Comparators for cross-executable equivalence (burst vs single steps).

``step_many_*`` scans the SAME traced step function, but XLA compiles the
scan body as a different executable than the standalone jitted step and may
fuse/schedule float ops differently — so burst results match single-step
results to float ULP, not bit-for-bit (the same contract as the sharded and
Pallas execution modes, tests/test_dist.py / test_pallas.py).  Integer state
(NCO phase numerators) must still be exact.
"""

import numpy as np


def assert_outputs_close(got: dict, want: dict, err_msg=""):
    assert set(got) == set(want), err_msg
    for key, w in want.items():
        g = np.asarray(got[key])
        w = np.asarray(w)
        if w.dtype in (np.int16, np.uint8):
            d = np.abs(g.astype(np.int32) - w.astype(np.int32))
            assert d.max() <= 1, (key, err_msg, d.max())
            # boundary-flip rate: for tonal signals ~1e-4; full-scale noise
            # inputs sit near quantization boundaries far more often
            assert (d > 0).mean() < 0.05, (key, err_msg)
        else:
            np.testing.assert_allclose(
                g, w, rtol=1e-4, atol=1e-5, err_msg=f"{key} {err_msg}"
            )


def assert_states_close(rx, got_vec, want_vec):
    """Compare two packed state vectors leaf-by-leaf via the receiver's
    named spec: integer leaves exact, float leaves to ULP tolerance."""
    got = rx._svec.export_named(np.asarray(got_vec))
    want = rx._svec.export_named(np.asarray(want_vec))
    for key, w in want.items():
        g = got[key]
        if w.dtype == np.uint32:
            np.testing.assert_array_equal(g, w, err_msg=key)
        else:
            np.testing.assert_allclose(g, w, rtol=1e-4, atol=1e-5, err_msg=key)
