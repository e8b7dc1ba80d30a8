"""Variant attention/style features (models/attention.py).

The reference deleted these modules in its baseline reversion
(Documentation/BASELINE_REVERSION.md §2) but kept the constructor flags
(generator_resnet_attn.py:88-99); here they are working re-designs. The
contracts under test:

1. Baseline configs are untouched — same param tree, same tap ids.
2. Enabling any flag is an exact identity at init (zero-init gains /
   closed gates), so a variant run CONTINUES the baseline model.
3. The stochastic style gate is keyed (deterministic per key, off without
   a key) and the full CUT train step runs finite with everything on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from test_cut_trainer import tiny_config

from gan_variant_research_tpu.models import (
    ChannelAttention,
    ResNetGenerator,
    SelfAttention2d,
    StyleGate,
)


def _tree_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out |= _tree_paths(v, p)
        else:
            out.add(p)
    return out


def _gen(**kw):
    return ResNetGenerator(ngf=8, n_blocks=3, **kw)


X = jnp.asarray(np.random.default_rng(3).uniform(-1, 1, (2, 32, 32, 3))
                .astype(np.float32))


class TestBaselineUnchanged:
    def test_param_tree_has_no_variant_modules_by_default(self):
        params = _gen().init(jax.random.key(0), X)["params"]
        names = {k for k in params}
        assert not any(k.startswith(("attn_", "channel_attn_", "style_gate_"))
                       for k in names)

    def test_variant_params_are_a_superset(self):
        base = _gen().init(jax.random.key(0), X)["params"]
        var = _gen(
            use_attention=True, attn_layers=(1,),
            use_channel_attn=True, channel_attn_layers=(2,),
            use_style_dropout=True,
        ).init(jax.random.key(0), X)["params"]
        base_paths = _tree_paths(base)
        var_paths = _tree_paths(var)
        assert base_paths < var_paths
        extra = {p.split("/")[0] for p in (var_paths - base_paths)}
        assert extra == {"attn_1", "channel_attn_2",
                         "style_gate_0", "style_gate_1", "style_gate_2"}


class TestIdentityAtInit:
    def test_enabled_variants_are_identity_at_init(self):
        """Same init key ⇒ shared modules get identical params (flax folds
        the rng by module path), and the freshly-initialized variant blocks
        are exact identities — so the two forwards agree bitwise."""
        base = _gen()
        var = _gen(use_attention=True, attn_layers=(0, 2),
                   use_channel_attn=True, channel_attn_layers=(1,),
                   use_style_dropout=True)
        pb = base.init(jax.random.key(7), X)
        pv = var.init(jax.random.key(7), X)
        yb = np.asarray(base.apply(pb, X))
        yv = np.asarray(var.apply(pv, X))  # no style_key: gates closed
        np.testing.assert_array_equal(yb, yv)

    def test_tap_ids_unchanged_with_variants_on(self):
        var = _gen(use_attention=True, attn_layers=(1,), use_style_dropout=True)
        pv = var.init(jax.random.key(0), X)
        _, feats = var.apply(pv, X, extract=(0, 1, 2, 3, 4, 5))
        # stem + 2 downsample + 3 res blocks = 6 taps at 32² input
        assert len(feats) == 6

    def test_self_attention_moves_output_once_gamma_does(self):
        mod = SelfAttention2d(8)
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((1, 6, 6, 8)).astype(np.float32))
        params = mod.init(jax.random.key(1), x)
        np.testing.assert_array_equal(np.asarray(mod.apply(params, x)),
                                      np.asarray(x))
        params = jax.tree_util.tree_map(lambda v: v, params)
        params["params"]["gamma"] = jnp.asarray(0.5)
        assert not np.allclose(np.asarray(mod.apply(params, x)), np.asarray(x))

    def test_channel_attention_identity_at_init_nonidentity_trained(self):
        mod = ChannelAttention(8)
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, 5, 5, 8)).astype(np.float32))
        params = mod.init(jax.random.key(2), x)
        np.testing.assert_allclose(np.asarray(mod.apply(params, x)),
                                   np.asarray(x), atol=0)
        params["params"]["fc2"]["bias"] = jnp.full((8,), 2.0)
        y = np.asarray(mod.apply(params, x))
        assert not np.allclose(y, np.asarray(x))


class TestStyleGate:
    def test_keyed_deterministic_unkeyed_identity(self):
        mod = StyleGate(8, alpha_min=0.4, alpha_max=0.9)
        x = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((3, 4, 4, 8)).astype(np.float32))
        params = mod.init(jax.random.key(0), x)
        np.testing.assert_array_equal(np.asarray(mod.apply(params, x)),
                                      np.asarray(x))
        k = jax.random.key(11)
        y1 = np.asarray(mod.apply(params, x, k))
        y2 = np.asarray(mod.apply(params, x, k))
        np.testing.assert_array_equal(y1, y2)
        assert not np.allclose(y1, np.asarray(x))
        y3 = np.asarray(mod.apply(params, x, jax.random.key(12)))
        assert not np.array_equal(y1, y3)

    def test_gate_output_stays_between_branches(self):
        """out = α·x + (1−α)·styled with α ∈ [αmin, αmax] ⊂ (0,1): each
        element lies between the two branch values."""
        mod = StyleGate(4)
        x = jnp.asarray(np.random.default_rng(4)
                        .standard_normal((2, 3, 3, 4)).astype(np.float32))
        params = mod.init(jax.random.key(0), x)
        params["params"]["gamma"] = jnp.full((4,), 1.7)
        params["params"]["beta"] = jnp.full((4,), -0.3)
        from gan_variant_research_tpu.ops.nn_ops import instance_norm

        styled = 1.7 * instance_norm(x) - 0.3
        y = mod.apply(params, x, jax.random.key(5))
        lo = jnp.minimum(x, styled) - 1e-5
        hi = jnp.maximum(x, styled) + 1e-5
        assert bool(jnp.all((y >= lo) & (y <= hi)))


class TestTrainStepWithVariants:
    def test_cut_step_runs_finite_with_all_variants_on(self):
        from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

        cfg = tiny_config()
        gen = cfg["model"]["generator"]
        gen["use_attention"] = True
        gen["attn_layers"] = [0]
        gen["use_channel_attn"] = True
        gen["channel_attn_layers"] = [1]
        gen["use_style_dropout"] = True
        trainer = CUTTrainer(cfg)
        state = trainer.init_state()
        rng = np.random.default_rng(0)
        b = cfg["batch_size"]
        size = cfg["image_size"]
        photos = rng.integers(0, 256, (b, size, size, 3), dtype=np.uint8)
        monets = rng.integers(0, 256, (b, size, size, 3), dtype=np.uint8)
        losses0 = losses1 = None
        for step in range(2):
            state, losses = trainer.train_step(state, photos, monets, step=step)
            if step == 0:
                losses0 = {k: float(v) for k, v in losses.items()}
            else:
                losses1 = {k: float(v) for k, v in losses.items()}
        for k, v in {**losses0, **losses1}.items():
            assert np.isfinite(v), f"{k} not finite"
        # the variant params are trained and EMA-tracked
        g = state.g_params
        assert "attn_0" in g and "style_gate_0" in g
        assert "attn_0" in state.ema

    def test_variant_step_is_seed_deterministic(self):
        from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

        cfg = tiny_config()
        cfg["model"]["generator"]["use_style_dropout"] = True
        rng = np.random.default_rng(1)
        b, size = cfg["batch_size"], cfg["image_size"]
        photos = rng.integers(0, 256, (b, size, size, 3), dtype=np.uint8)
        monets = rng.integers(0, 256, (b, size, size, 3), dtype=np.uint8)

        def run():
            trainer = CUTTrainer(cfg)
            state = trainer.init_state(seed=5)
            state, losses = trainer.train_step(state, photos, monets, step=0)
            return {k: float(v) for k, v in losses.items()}

        a, b_ = run(), run()
        assert a == b_


class TestFlashAttentionKernel:
    """The Pallas flash path must be the same math as the einsum core.

    The suite runs on the virtual CPU mesh, so the kernel executes under
    Pallas TPU interpret mode — same program, simulated grid — against the
    einsum reference. On-chip timing lives in docs/PERF.md ("Variant
    self-attention: flash kernel")."""

    @staticmethod
    def _einsum_core(q, k, v):
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        return jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(logits, -1), v)

    def test_flash_matches_einsum_fwd_and_grads(self):
        import jax.experimental.pallas.tpu as pltpu

        from gan_variant_research_tpu.models.attention import (
            flash_spatial_attention,
        )

        B, N, C, inner = 2, 1024, 128, 16
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (B, N, inner), jnp.float32)
        k = jax.random.normal(kk, (B, N, inner), jnp.float32)
        v = jax.random.normal(kv, (B, N, C), jnp.float32)

        def loss(f):
            return lambda q, k, v: jnp.sum(f(q, k, v) ** 2)

        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(flash_spatial_attention(q, k, v))
            gf = jax.grad(loss(flash_spatial_attention),
                          argnums=(0, 1, 2))(q, k, v)
        ref = np.asarray(self._einsum_core(q, k, v))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        gr = jax.grad(loss(self._einsum_core), argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
            assert rel < 1e-4, f"d{name} max-rel {rel}"

    def test_flash_eligibility_routing(self):
        import pytest

        from gan_variant_research_tpu.models.attention import flash_eligible
        from gan_variant_research_tpu.parallel.mesh import create_mesh

        # "auto" resolves by backend: the suite is pinned to CPU → einsum
        assert jax.default_backend() == "cpu"
        assert not flash_eligible(4096, 32, 256, "auto")
        # explicit True honors the shape gates
        assert flash_eligible(4096, 32, 256, True)       # the 64² trunk
        assert flash_eligible(16384, 32, 256, True)      # the 128² trunk
        assert not flash_eligible(64, 8, 256, True)      # tiny test grids
        assert not flash_eligible(4096, 32, 192, True)   # C % 128 != 0
        assert not flash_eligible(4096, 200, 256, True)  # q/k wider than a head
        assert not flash_eligible(4096, 32, 256, False)
        # any string but the literal "auto" must fail loudly, not silently
        # force the kernel on (quoted YAML "false" is a string)
        for bad in ("false", "off", "Auto", "true"):
            with pytest.raises(ValueError, match="attn_flash"):
                flash_eligible(4096, 32, 256, bad)
        # >1-device mesh: the shard_map route needs an evenly split batch
        mesh8 = create_mesh(num_devices=8)
        assert flash_eligible(4096, 32, 256, True, mesh=mesh8, batch=16)
        assert not flash_eligible(4096, 32, 256, True, mesh=mesh8, batch=12)
        assert not flash_eligible(4096, 32, 256, True, mesh=mesh8, batch=None)
        # "auto" with a mesh consults the mesh's device platform (cpu here)
        assert not flash_eligible(4096, 32, 256, "auto", mesh=mesh8, batch=16)

    def test_flash_shard_map_over_dp_mesh_lowers(self):
        """On a >1-device mesh the flash kernel runs under an explicit
        shard_map over the batch axis — GSPMD cannot auto-partition Mosaic
        kernels (the lowering error says "wrap the call in a shard_map",
        which is exactly what SelfAttention2d does when mesh.num_devices>1).

        Executing a multi-device interpret-mode kernel deadlocks XLA-CPU's
        callback machinery, so this pins the route at the trace/lowering
        level on the virtual 8-device mesh: the program must trace, and the
        jit lowering must contain the manual (shard_map) sharding regions.
        Kernel NUMERICS are pinned single-device by the interpret-mode test
        above, and shard_map over per-sample math is exact by construction.
        """
        import jax.experimental.pallas.tpu as pltpu

        from gan_variant_research_tpu.models.attention import SelfAttention2d
        from gan_variant_research_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(num_devices=8)
        B, H, W, C = 8, 32, 32, 128  # HW=1024: flash-eligible
        x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C))
        m_flash = SelfAttention2d(C, flash=True, mesh=mesh)
        p = jax.eval_shape(
            lambda: SelfAttention2d(C, flash=False).init(
                jax.random.PRNGKey(0), x))
        p = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), p)

        out_aval = jax.eval_shape(m_flash.apply, p, x)
        assert out_aval.shape == (B, H, W, C)
        with pltpu.force_tpu_interpret_mode():
            txt = jax.jit(
                m_flash.apply,
                in_shardings=(mesh.replicated(), mesh.batch_sharding(4)),
            ).lower(p, x).as_text()
        assert "manual" in txt or "shmap" in txt  # shard_map regions present

    def test_module_einsum_path_unchanged_by_flash_flag(self):
        """On CPU, flash="auto" and flash=False are the same program — the
        routing must not perturb the shipped einsum numerics."""
        from gan_variant_research_tpu.models.attention import SelfAttention2d

        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 64))
        m_auto = SelfAttention2d(64, flash="auto")
        m_off = SelfAttention2d(64, flash=False)
        p = m_auto.init(jax.random.PRNGKey(0), x)
        np.testing.assert_array_equal(
            np.asarray(m_auto.apply(p, x)), np.asarray(m_off.apply(p, x)))
