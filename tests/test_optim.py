"""Optimizer/schedule factory tests."""

import numpy as np
import optax
import pytest

from gan_variant_research_tpu.train.optim import (
    cosine_schedule,
    linear_decay_after,
    linear_warmup_decay,
    make_optimizer,
    optimizer_from_config,
)


def test_cosine_schedule_endpoints():
    s = cosine_schedule(2e-4, 5e-5, 1000)
    assert float(s(0)) == pytest.approx(2e-4)
    assert float(s(1000)) == pytest.approx(5e-5, rel=1e-5)
    assert float(s(500)) == pytest.approx((2e-4 + 5e-5) / 2, rel=1e-2)


def test_linear_decay_after():
    s = linear_decay_after(1e-3, start_decay_step=100, total_steps=200)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(99)) == pytest.approx(1e-3)
    assert float(s(150)) == pytest.approx(5e-4)
    assert float(s(200)) == pytest.approx(0.0, abs=1e-10)


def test_linear_warmup_decay():
    s = linear_warmup_decay(1e-3, warmup_steps=10, total_steps=110)
    assert float(s(0)) == pytest.approx(0.0)
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(110)) == pytest.approx(0.0, abs=1e-9)


def test_clip_is_applied():
    import jax.numpy as jnp

    opt = make_optimizer(lr=1.0, grad_clip=1.0)
    params = {"w": jnp.zeros(4)}
    state = opt.init(params)
    huge = {"w": jnp.full(4, 100.0)}
    updates, _ = opt.update(huge, state, params)
    # global norm clipped to 1 before adam; adam normalizes anyway but the
    # result must be finite and bounded
    assert float(jnp.abs(updates["w"]).max()) <= 1.0 + 1e-6


def test_optimizer_from_config_scheduler_gate():
    cfg = {"lr": 2e-4, "betas": [0.5, 0.999],
           "scheduler": {"enabled": False, "type": "cosine", "lr_min": 5e-5}}
    opt = optimizer_from_config(cfg, grad_clip=10.0, max_steps=None)
    assert isinstance(opt, optax.GradientTransformation)
    cfg["scheduler"]["enabled"] = True
    with pytest.raises(ValueError, match="max_steps"):
        optimizer_from_config(cfg, grad_clip=10.0, max_steps=None)
    opt2 = optimizer_from_config(cfg, grad_clip=10.0, max_steps=1000)
    assert isinstance(opt2, optax.GradientTransformation)


def test_adam_matches_torch_one_step(rng):
    """optax.adam(b1=0.5) must match torch.optim.Adam bias-corrected step."""
    import jax.numpy as jnp
    import torch

    w0 = rng.standard_normal(8).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=2e-4, betas=(0.5, 0.999))
    tw.grad = torch.from_numpy(g.copy())
    topt.step()

    opt = make_optimizer(lr=2e-4, betas=(0.5, 0.999))
    params = jnp.asarray(w0)
    state = opt.init(params)
    upd, _ = opt.update(jnp.asarray(g), state, params)
    got = np.asarray(params + upd)
    np.testing.assert_allclose(got, tw.detach().numpy(), atol=1e-6)
