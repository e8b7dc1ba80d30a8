"""train_window (scan multi-step) must reproduce the single-step trajectory
exactly, including R1 steps and the identity warmup boundary."""

import numpy as np
import pytest
import jax

from gan_variant_research_tpu.train.cut_trainer import CUTTrainer
from test_cut_trainer import tiny_config, batches


@pytest.mark.slow
def test_window_matches_single_steps(rng):
    cfg = tiny_config()
    cfg["warmup_steps"] = 5  # identity flips off inside the window
    cfg["r1"]["every"] = 3
    # ONE trainer, two independent states: the single-step and window paths
    # share the same jit wrappers, halving the compile count of this test
    t1 = t2 = CUTTrainer(cfg)
    s1 = t1.init_state()
    s2 = t2.init_state()

    k = 8
    ps = np.stack([batches(rng)[0] for _ in range(k)])
    rng2 = np.random.default_rng(1)
    ms = np.stack([batches(rng2)[1] for _ in range(k)])

    singles = []
    for i in range(k):
        s1, l = t1.train_step(s1, ps[i], ms[i], step=i)
        singles.append({kk: float(vv) for kk, vv in l.items()})

    s2, stacked = t2.train_window(s2, ps, ms, start_step=0)
    assert int(s2.step) == k
    for i in range(k):
        for kk in singles[i]:
            got = float(np.asarray(stacked[kk])[i])
            assert got == pytest.approx(singles[i][kk], rel=1e-5, abs=1e-6), (i, kk)

    # final params equal up to cross-compilation reduction reassociation
    # (the scan and the single-step jit are different XLA programs)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_nan_tripwire_raises():
    """The loop's numeric sanitizer must halt on non-finite losses
    (reference train_cutpp.py:326-329) but ignore identity_weight, which
    legitimately anneals through exact 0.0 and is excluded."""
    from gan_variant_research_tpu.train.loop import _check_finite

    _check_finite(3, {"d_loss": 1.0, "g_loss": 2.0, "identity_weight": 0.0})
    with pytest.raises(ValueError, match="NaN loss detected at step 7"):
        _check_finite(7, {"d_loss": float("nan"), "g_loss": 1.0})
    with pytest.raises(ValueError):
        _check_finite(8, {"d_loss": float("inf"), "g_loss": 1.0})
