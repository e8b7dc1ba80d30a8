"""CUT training: one donated jitted step with full reference semantics.

Semantics matched against GAN_Variant1/training/train_cutpp.py:165-331
(train_step + r1_regularization):

1. D update — hinge on (DiffAug(real), DiffAug(stop_grad(fake))); reals are
   photos in the reference (:246, a documented quirk — SURVEY.md §2.6 item
   1) or Monets with the CUT-correct ``runtime.d_real_domain: monet``.
2. Lazy R1 every ``r1.every`` steps as a SECOND D optimizer step
   (:257-263): fp32 D re-forward, grad-of-grad w.r.t. the images
   (jax.grad-of-jax.grad — no create_graph plumbing needed), penalty
   weighted by gamma·every. A `lax.cond` keeps both branches in one
   compiled step.
3. G update — adv hinge on DiffAug(fake) against the *updated* D +
   PatchNCE (src features detached) + fp32-island identity loss with the
   linear warmup weight (:224-228).
4. EMA shadow update (decay 0.999) every step.

TPU-first deviations (gradient-equivalent, SURVEY.md §3.1): the fake image
and the source-side NCE features come from a single generator forward
(the reference runs 5 G forwards/step); the D real/fake passes are one
batched forward. Data augmentation runs on device inside the same jit.
Scale-out is GSPMD data parallelism: params/opt-state replicated, batches
sharded on the leading axis over the mesh; XLA inserts the gradient
all-reduces (SURVEY.md §2.4 "distributed communication backend").
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from gan_variant_research_tpu.core.precision import Policy, policy_from_config
from gan_variant_research_tpu.core.prng import step_keys
from gan_variant_research_tpu.data.augment import train_augment
from gan_variant_research_tpu.losses import (
    discriminator_hinge_loss,
    feature_matching_loss,
    generator_hinge_loss,
    palette_prior_loss,
    patch_nce_loss,
    identity_loss,
    repulsion_loss,
)
from gan_variant_research_tpu.models import (
    MultiscaleDiscriminator,
    ResNetGenerator,
)
from gan_variant_research_tpu.ops.diffaugment import diff_augment
from gan_variant_research_tpu.parallel.mesh import MeshContext, create_mesh
from gan_variant_research_tpu.train.ema import ema_init, ema_update
from gan_variant_research_tpu.train.optim import optimizer_from_config


class CUTTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    d_spectral: Any
    opt_g: Any
    opt_d: Any
    ema: Any
    base_key: jax.Array


def build_generator(gen_cfg: dict, policy: Policy,
                    mesh=None) -> ResNetGenerator:
    """Mirror of the reference generator builder (train_cutpp.py:93-110).

    ``mesh`` (a ``MeshContext``) is wired into the attention blocks so the
    flash kernel can shard_map over a >1-device DP mesh — Mosaic kernels
    cannot be auto-partitioned by GSPMD (models/attention.py)."""
    sd = gen_cfg.get("style_dropout") or {}
    return ResNetGenerator(
        output_nc=3,
        ngf=gen_cfg.get("ngf", 64),
        n_blocks=gen_cfg.get("n_blocks", 9),
        n_downsampling=gen_cfg.get("n_downsampling", 2),
        padding_type=gen_cfg.get("padding_type", "reflect"),
        norm=gen_cfg.get("norm", "instance"),
        activation=gen_cfg.get("activation", "relu"),
        use_attention=gen_cfg.get("use_attention", False),
        attn_layers=tuple(gen_cfg.get("attn_layers", (3, 7))),
        attn_flash=gen_cfg.get("attn_flash", "auto"),
        attn_mesh=mesh,
        use_channel_attn=gen_cfg.get("use_channel_attn", False),
        channel_attn_layers=tuple(gen_cfg.get("channel_attn_layers", (5,))),
        use_style_dropout=gen_cfg.get("use_style_dropout", False),
        alpha_min=sd.get("alpha_min", 0.4),
        alpha_max=sd.get("alpha_max", 0.9),
        remat=gen_cfg.get("remat", False),
        use_pallas=gen_cfg.get("use_pallas", False),
        pad_free=gen_cfg.get("pad_free", False),
        use_s2d=gen_cfg.get("use_s2d", True),
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )


def build_discriminator(disc_cfg: dict, policy: Policy) -> MultiscaleDiscriminator:
    """Mirror of the reference discriminator builder (train_cutpp.py:112-119)."""
    return MultiscaleDiscriminator(
        ndf=disc_cfg.get("ndf", 64),
        n_layers=disc_cfg.get("n_layers", 3),
        num_scales=disc_cfg.get("num_scales", 1),
        norm=disc_cfg.get("norm", "none"),
        use_spectral_norm=disc_cfg.get("use_spectral_norm", False),
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )


LOSS_KEYS = ("d_loss", "g_loss", "g_adv", "nce", "identity", "r1",
             "identity_weight", "featmatch", "palette", "repulsion")


class CUTTrainer:
    """Owns the models, optimizers, mesh and the compiled train step."""

    def __init__(self, config: dict, mesh: MeshContext | None = None):
        from gan_variant_research_tpu.core.cache import enable_persistent_cache

        enable_persistent_cache()
        self.config = config
        self.policy = policy_from_config(config)
        par_cfg = config.get("parallel") or {}
        self.mesh = mesh or create_mesh(
            num_devices=par_cfg.get("num_devices"),
            data_axis=par_cfg.get("data_axis", "data"),
        )

        gen_cfg = config["model"]["generator"]
        disc_cfg = config["model"]["discriminator"]
        self.generator = build_generator(gen_cfg, self.policy, self.mesh)
        self.discriminator = build_discriminator(disc_cfg, self.policy)
        # fp32 twins share the same param trees — the fp32 islands
        fp32 = Policy(compute_dtype=jnp.float32)
        self.generator_f32 = build_generator(gen_cfg, fp32, self.mesh)
        self.discriminator_f32 = build_discriminator(disc_cfg, fp32)

        max_steps = self._max_steps_hint()
        self.opt_g = optimizer_from_config(
            config["optim"]["G"], config.get("grad_clip_g", 10.0), max_steps
        )
        self.opt_d = optimizer_from_config(
            config["optim"]["D"], config.get("grad_clip_d", 10.0), max_steps
        )

        runtime = config.get("runtime") or {}
        # The reference forces the identity loss through fp32
        # (losses/identity_l1.py:18) as an fp16-underflow guard under CUDA
        # AMP. bf16 has the fp32 exponent range, so the guard is unnecessary
        # on TPU; default bf16, set runtime.identity_fp32=true for strict
        # reference numerics.
        self.identity_fp32 = bool(runtime.get("identity_fp32", False))
        # Style dropout (models/attention.py StyleGate) is train-only and
        # stochastic: when enabled, every training-time generator forward
        # (the shared big forward AND the identity pass) draws per-sample
        # blend keys; inference (generate) passes no key and the gate is an
        # exact no-op. Baseline configs never reach this branch, so the
        # compiled baseline step is unchanged.
        self.style_dropout = bool(gen_cfg.get("use_style_dropout", False))
        self.d_real_domain = runtime.get("d_real_domain", "monet")
        if self.d_real_domain not in ("photo", "monet"):
            raise ValueError(f"runtime.d_real_domain must be photo|monet, got {self.d_real_domain}")

        # k-NN repulsion (the deleted losses/repulsion_knn.py, re-designed —
        # see that module's docstring): a frozen pool3 embedder + a
        # precomputed Monet feature bank, both replicated over the mesh and
        # closed over by the step as constants. Gated on loss_weights
        # .repulsion > 0 AND repulsion.enabled (default on when weighted).
        self._repulsion = None
        rep_w0 = float((config.get("loss_weights") or {}).get("repulsion", 0.0))
        rep_cfg = config.get("repulsion") or {}
        if rep_w0 > 0 and rep_cfg.get("enabled", True):
            from gan_variant_research_tpu.train.feature_bank import (
                ensure_feature_bank,
                load_inception_params,
                load_margin,
                make_embed_fn,
            )

            from gan_variant_research_tpu.train.feature_bank import (
                monet_source_path,
            )

            clip_cfg = config.get("clip_features") or {}
            bank = ensure_feature_bank(
                clip_cfg, monet_source_path(config.get("data"))
            )
            # lazy: an explicitly configured margin must not require (or
            # even read) a margin file — dict.get() would evaluate the
            # fallback eagerly and fail on a missing/malformed file whose
            # value would be discarded
            margin = float(
                rep_cfg["margin"] if "margin" in rep_cfg
                else load_margin(clip_cfg.get("margin_path"))
            )
            # Place via a jitted identity, not jax.device_put: device_put
            # rejects shardings spanning non-addressable devices, so the
            # direct put breaks on multi-host pods (same contract as
            # replicate_state — every process holds identical host data).
            # The bank is L2-normalized ONCE here; the step then skips the
            # per-step renormalization of a constant.
            from gan_variant_research_tpu.losses.repulsion_knn import (
                normalize_rows,
            )

            rep_sh = self.mesh.replicated()
            _put = jax.jit(lambda t: t, out_shardings=rep_sh)
            inc_params = _put(load_inception_params(clip_cfg))
            # repulsion.every (default 1 = reference semantics): lazy
            # cadence for the 299² pool3 embed, the dominant cost of the
            # everything-on step (docs/PERF.md: ~45 ms of the +129 ms
            # variant delta). every=K runs the embed + hinge on steps where
            # step % K == 0 with the penalty scaled ×K — the same
            # time-averaged-gradient amortization the reference applies to
            # R1 (train_cutpp.py lazy regularization; Karras et al. 2020).
            # A *documented divergence* knob, off by default; the branch is
            # a lax.cond so the off-step compiled program skips the embed
            # FLOPs at runtime rather than hiding them.
            every = int(rep_cfg.get("every", 1))
            if every < 1:
                raise ValueError(f"repulsion.every must be >= 1, got {every}")
            self._repulsion = {
                "bank": jax.jit(normalize_rows, out_shardings=rep_sh)(
                    np.asarray(bank, np.float32)),
                "margin": margin,
                "embed": make_embed_fn(inc_params),
                "every": every,
            }

        # Donation halves peak HBM on a real TPU VM; validate_donation raises
        # with the measured reason on the backends where it is known-broken
        # (XLA CPU, the axon tunnel) instead of failing later.
        from gan_variant_research_tpu.parallel.mesh import validate_donation

        donate = validate_donation(bool(runtime.get("donate", False)))
        # loops consult this to snapshot checkpoint payloads before the next
        # donated step invalidates the captured buffers (AsyncCheckpointer)
        self.donate = donate
        rep = self.mesh.replicated()
        batch_sh = self.mesh.batch_sharding(4)
        # do_r1 / do_identity are STATIC: the host decides them from the step
        # counter exactly like the reference's Python-side branches
        # (train_cutpp.py:226,257,292). Keeping them as lax.cond would make
        # XLA execute BOTH branches every step under grad (measured: the
        # fp32 identity pass and the R1 double-backward ran unconditionally,
        # ~2× step time).
        self._jit_step = jax.jit(
            self._train_step,
            static_argnums=(3, 4),
            donate_argnums=(0,) if donate else (),
            in_shardings=(rep, batch_sh, batch_sh),
            out_shardings=(rep, rep),
        )
        # Multi-step window: lax.scan over K bare steps entirely on device —
        # one dispatch per window amortizes the host/tunnel dispatch latency
        # (~30 ms/step measured non-overlapped on the axon tunnel). R1 steps
        # run via the single-step path so the double-backward stays a static
        # branch.
        from jax.sharding import NamedSharding, PartitionSpec as P

        window_sh = NamedSharding(
            self.mesh.mesh, P(None, self.mesh.data_axis, None, None, None)
        )
        self._jit_scan = jax.jit(
            self._train_scan,
            static_argnums=(3,),
            donate_argnums=(0,) if donate else (),
            in_shardings=(rep, window_sh, window_sh),
            out_shardings=(rep, rep),
        )

    # ------------------------------------------------------------------ #

    def _max_steps_hint(self) -> int | None:
        cfg = self.config
        if cfg.get("max_steps"):
            return int(cfg["max_steps"])
        return None

    def init_state(self, seed: int | None = None) -> CUTTrainState:
        seed = seed if seed is not None else self.config.get("seed", 42)
        size = self.config.get("image_size", 256)

        # One jitted init: eager flax .init dispatches hundreds of tiny ops
        # individually (~60 s over the axon tunnel); fused it is sub-second
        # and the program lands in the persistent compile cache.
        @partial(jax.jit, out_shardings=self.mesh.replicated())
        def _init(seed_arr):
            key = jax.random.key(seed_arr)
            kg, kd, krun = jax.random.split(key, 3)
            dummy = jnp.zeros((1, size, size, 3), jnp.float32)
            g_vars = self.generator.init(kg, dummy)
            d_vars = self.discriminator.init(kd, dummy)
            g_params = g_vars["params"]
            d_params = d_vars["params"]
            return CUTTrainState(
                step=jnp.zeros((), jnp.int32),
                g_params=g_params,
                d_params=d_params,
                d_spectral=d_vars.get("spectral", {}),
                opt_g=self.opt_g.init(g_params),
                opt_d=self.opt_d.init(d_params),
                ema=ema_init(g_params),
                base_key=krun,
            )

        return _init(jnp.asarray(seed, jnp.uint32))

    def _apply_d(self, d_params, d_spectral, x, update_sn: bool, fp32: bool = False,
                 extract_features: bool = False):
        """Returns (preds, d_spectral), or ((preds, feats), d_spectral) with
        ``extract_features=True`` (the feature-matching tap)."""
        model = self.discriminator_f32 if fp32 else self.discriminator
        variables = {"params": d_params}
        kw = {"extract_features": True} if extract_features else {}
        if d_spectral:
            variables["spectral"] = d_spectral
            if update_sn:
                preds, mut = model.apply(
                    variables, x, update_sn=True, mutable=["spectral"], **kw
                )
                return preds, mut["spectral"]
            return model.apply(variables, x, update_sn=False, **kw), d_spectral
        return model.apply(variables, x, **kw), d_spectral

    # ------------------------------------------------------------------ #

    def identity_weight_at(self, step: int) -> float:
        """Host-side identity warmup weight (train_cutpp.py:224-228)."""
        lw = self.config["loss_weights"]
        warm = float(lw.get("identity_warm", 0.1))
        final = float(lw.get("identity_final", 0.0))
        warmup = int(self.config.get("warmup_steps", 20000))
        frac = min(step / warmup, 1.0) if warmup > 0 else 1.0
        return warm + (final - warm) * frac

    def step_flags(self, step: int) -> tuple[bool, bool]:
        """(do_r1, do_identity) for a given step index."""
        r1_cfg = self.config.get("r1") or {}
        do_r1 = float(r1_cfg.get("gamma", 0.0)) > 0 and (
            step % int(r1_cfg.get("every", 16)) == 0
        )
        do_identity = self.identity_weight_at(step) > 0
        return do_r1, do_identity

    def train_step(self, state: CUTTrainState, photos_u8, monets_u8,
                   step: int | None = None):
        """One training step. Pass the host-side ``step`` counter to avoid a
        device sync (falls back to fetching state.step)."""
        if step is None:
            step = int(state.step)
        do_r1, do_identity = self.step_flags(step)
        return self._jit_step(state, photos_u8, monets_u8, do_r1, do_identity)

    def _train_scan(self, state, photos_w, monets_w, do_identity: bool):
        """Scan K bare (no-R1) steps over stacked (K, B, H, W, C) batches."""

        def body(st, batch):
            p, m = batch
            return self._train_step(st, p, m, False, do_identity)

        return jax.lax.scan(body, state, (photos_w, monets_w))

    def train_window(self, state, photos_w, monets_w, start_step: int):
        """Run K = photos_w.shape[0] consecutive steps with a minimal number
        of dispatches: single-step calls exactly on R1 steps, on-device scans
        over the bare stretches in between (segments also split at the
        identity warmup boundary). Exactly equivalent to K train_step calls.
        Returns (state, stacked losses with leading dim K)."""
        k = photos_w.shape[0]
        losses_list = []
        idx = 0
        while idx < k:
            step = start_step + idx
            do_r1, do_identity = self.step_flags(step)
            if do_r1:
                state, l = self.train_step(
                    state, photos_w[idx], monets_w[idx], step=step
                )
                losses_list.append(jax.tree_util.tree_map(lambda x: x[None], l))
                idx += 1
                continue
            end = idx + 1
            while end < k:
                r1_e, id_e = self.step_flags(start_step + end)
                if r1_e or id_e != do_identity:
                    break
                end += 1
            state, ls = self._jit_scan(
                state, photos_w[idx:end], monets_w[idx:end], do_identity
            )
            losses_list.append(ls)
            idx = end
        if len(losses_list) == 1:
            return state, losses_list[0]
        return state, jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *losses_list
        )

    def warm_compile(self, state, photos_u8, monets_u8, variants=None,
                     parallel: bool = False, progress=None):
        """Pre-compile step variants (results discarded; requires donation
        off, the default). ``variants`` restricts to specific
        (do_r1, do_identity) pairs; default is all four. ``parallel=True``
        compiles them from worker threads — XLA compilation releases the
        GIL, so a cold cache pays max() instead of sum() of compile times
        (bench.py relies on this; the main thread stays signal-responsive
        by polling the joins). ``progress(variant)`` is called as each
        variant finishes."""
        if variants is None:
            variants = [(r1, idt) for r1 in (False, True)
                        for idt in (False, True)]

        def one(v):
            self._jit_step(state, photos_u8, monets_u8, *v)
            if progress is not None:
                progress(v)

        if not parallel:
            for v in variants:
                one(v)
            return

        import threading

        errors = []

        def guarded(v):
            try:
                one(v)
            except BaseException as e:  # surfaced on the caller thread below
                errors.append((v, e))

        threads = [threading.Thread(target=guarded, args=(v,), daemon=True)
                   for v in variants]
        for t in threads:
            t.start()
        for t in threads:
            while t.is_alive():
                t.join(0.25)  # bounded joins keep signal handlers live
        if errors:
            if len(errors) > 1:
                # every failed variant matters for debugging a cold-cache
                # bench failure; don't let thread completion order hide
                # all but an arbitrary one
                raise RuntimeError(
                    "warm_compile: "
                    + "; ".join(f"variant (r1={v[0]}, idt={v[1]}) failed "
                                f"with {type(e).__name__}: {e}"
                                for v, e in errors)
                ) from errors[0][1]
            raise errors[0][1]

    def _train_step(self, state: CUTTrainState, photos_u8, monets_u8,
                    do_r1: bool = True, do_identity: bool = True):
        cfg = self.config
        lw = cfg["loss_weights"]
        adv_w = float(lw.get("adv", 1.0))
        nce_w = float(lw.get("patchnce", 1.0))
        idt_warm = float(lw.get("identity_warm", 0.1))
        idt_final = float(lw.get("identity_final", 0.0))
        # Re-designed variant losses (all deleted by the reference's baseline
        # reversion; losses/feat_matching.py, losses/palette_prior.py,
        # losses/repulsion_knn.py). Read at trace time → 0.0 (the reference
        # default) compiles them out of the step entirely. The surviving
        # `palette.enabled` / `repulsion.enabled` gates are honored on top of
        # the weights (train_gan_cutpp.yaml:139-149).
        fm_w = float(lw.get("featmatch", 0.0))
        pal_w = (float(lw.get("palette", 0.0))
                 if (cfg.get("palette") or {}).get("enabled", True) else 0.0)
        pal_cfg = cfg.get("palette_prior") or {}
        # reference key name is low_freq_size (train_gan_cutpp.yaml:146)
        pal_size = int(pal_cfg.get("low_freq_size",
                                   pal_cfg.get("target_size", 32)))
        rep_w = (float(lw.get("repulsion", 0.0))
                 if self._repulsion is not None else 0.0)
        warmup_steps = int(cfg.get("warmup_steps", 20000))
        nce_cfg = cfg.get("patchnce") or {}
        nce_layers = tuple(nce_cfg.get("nce_layers", (0, 4, 8, 12, 16)))
        temperature = float(nce_cfg.get("temperature", 0.07))
        num_patches = int(nce_cfg.get("num_patches", 256))
        r1_cfg = cfg.get("r1") or {}
        r1_gamma = float(r1_cfg.get("gamma", 0.0))
        r1_every = int(r1_cfg.get("every", 16))
        da_cfg = cfg.get("diffaugment") or {}
        da_policy = tuple(da_cfg.get("policy", ())) if da_cfg.get("enable") else None
        ema_decay = float((cfg.get("ema") or {}).get("decay", 0.999))
        image_size = int(cfg.get("image_size", 256))

        step = state.step
        key_names = ["photo_aug", "monet_aug", "da_real", "da_fake", "da_g", "nce"]
        if self.style_dropout:
            key_names += ["style_fwd", "style_nce", "style_idt"]
        keys = step_keys(state.base_key, step, tuple(key_names))
        style = (keys.get if self.style_dropout else (lambda _n: None))

        # Device-resident train transforms (dataio/transforms.py:30-47)
        photos = train_augment(keys["photo_aug"], photos_u8, image_size)
        monets = train_augment(keys["monet_aug"], monets_u8, image_size)

        # Identity warmup weight (train_cutpp.py:224-228)
        frac = jnp.minimum(step.astype(jnp.float32) / warmup_steps, 1.0)
        identity_weight = idt_warm + (idt_final - idt_warm) * frac

        real_images = photos if self.d_real_domain == "photo" else monets

        def maybe_aug(key, x):
            if da_policy is None:
                return x
            return diff_augment(key, x, da_policy)

        # One generator forward serves the whole step: the D-phase fake (the
        # reference's G fwd #1, detached), the G-phase adversarial fake
        # (G fwd #2 — identical value, G unchanged in between), the src NCE
        # features (G fwd #3, detached) and the tgt NCE features (G fwd #4,
        # trunk on the fake) — gradient-equivalent to train_cutpp.py:206-308
        # (SURVEY.md §3.1), via an explicit vjp closed over later.
        if nce_w > 0:
            def big_fwd(p):
                fake, src = self.generator.apply(
                    {"params": p}, photos, extract=nce_layers,
                    style_key=style("style_fwd"),
                )
                _, tgt = self.generator.apply(
                    {"params": p}, fake, extract=nce_layers,
                    style_key=style("style_nce"),
                )
                return fake, src, tgt
        else:
            def big_fwd(p):
                fake = self.generator.apply(
                    {"params": p}, photos, style_key=style("style_fwd")
                )
                return fake, [], []

        (fake, src_feats, tgt_feats), g_vjp = jax.vjp(big_fwd, state.g_params)
        fake_for_d = jax.lax.stop_gradient(fake)

        # ---------------- D update ----------------
        real_aug = maybe_aug(keys["da_real"], real_images)
        fake_aug = maybe_aug(keys["da_fake"], fake_for_d)
        b = real_aug.shape[0]

        def d_loss_fn(d_params):
            both = jnp.concatenate([real_aug, fake_aug], axis=0)
            preds, new_spec = self._apply_d(
                d_params, state.d_spectral, both, update_sn=True
            )
            real_preds = [p[:b] for p in preds]
            fake_preds = [p[b:] for p in preds]
            return discriminator_hinge_loss(real_preds, fake_preds), new_spec

        (d_loss, d_spectral), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.d_params
        )
        d_updates, opt_d_state = self.opt_d.update(d_grads, state.opt_d, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # ---------------- lazy R1 (second D step, static branch) ----------
        if do_r1:
            real_f32 = real_images.astype(jnp.float32)

            def r1_loss_fn(p):
                def d_sum(imgs):
                    preds, _ = self._apply_d(
                        p, d_spectral, imgs, update_sn=False, fp32=True
                    )
                    return sum(jnp.sum(x.astype(jnp.float32)) for x in preds)

                g_img = jax.grad(d_sum)(real_f32)
                r1 = jnp.mean(jnp.sum(jnp.square(g_img), axis=(1, 2, 3)))
                return r1 * r1_gamma * r1_every, r1

            (_, r1_value), r1_grads = jax.value_and_grad(r1_loss_fn, has_aux=True)(
                d_params
            )
            r1_upd, opt_d_state = self.opt_d.update(r1_grads, opt_d_state, d_params)
            d_params = optax.apply_updates(d_params, r1_upd)
        else:
            r1_value = jnp.zeros((), jnp.float32)

        # ---------------- G update (against the updated D) ----------------
        # differentiable head: losses as a function of (fake, tgt_feats);
        # src features enter as constants (the reference detaches them)
        def head_fn(fake_h, tgt_h):
            fake_aug_g = maybe_aug(keys["da_g"], fake_h)
            if fm_w > 0:
                # One D forward serves both the adversarial logits and the
                # feature-matching taps: concat(fake, real) through the
                # feature-extracting apply, then split. The real half is a
                # constant of this head (stop-gradient), so only the loss
                # value — not the D params — sees it.
                real_fm = jax.lax.stop_gradient(
                    maybe_aug(keys["da_real"], real_images)
                )
                nb = fake_aug_g.shape[0]
                (preds_all, feats_all), _ = self._apply_d(
                    d_params, d_spectral,
                    jnp.concatenate([fake_aug_g, real_fm], axis=0),
                    update_sn=False, extract_features=True,
                )
                preds = [p[:nb] for p in preds_all]
                fake_fm = [[f[:nb] for f in fs] for fs in feats_all]
                real_feats = [[f[nb:] for f in fs] for fs in feats_all]
                fm = feature_matching_loss(real_feats, fake_fm)
            else:
                preds, _ = self._apply_d(
                    d_params, d_spectral, fake_aug_g, update_sn=False
                )
                fm = jnp.zeros((), jnp.float32)
            g_adv = generator_hinge_loss(preds)
            if nce_w > 0:
                nce = patch_nce_loss(
                    keys["nce"],
                    [jax.lax.stop_gradient(f) for f in src_feats],
                    tgt_h,
                    temperature=temperature,
                    num_patches=num_patches,
                )
            else:
                nce = jnp.zeros((), jnp.float32)
            pal = (palette_prior_loss(fake_h, monets, target_size=pal_size)
                   if pal_w > 0 else jnp.zeros((), jnp.float32))
            if rep_w > 0:
                def rep_raw(fh):
                    r, _ = repulsion_loss(
                        self._repulsion["embed"](fh),
                        self._repulsion["bank"],
                        self._repulsion["margin"],
                        bank_normalized=True,
                    )
                    return r
                rep_every = int(self._repulsion["every"])
                if rep_every > 1:
                    # Lazy cadence (repulsion.every > 1): embed + hinge only
                    # on cadence steps, penalty ×every — R1-style amortized
                    # gradient. lax.cond executes one branch at runtime, so
                    # off steps skip the 299² embed FLOPs entirely (both in
                    # the forward and in the vjp through this head).
                    rep = jax.lax.cond(
                        step % rep_every == 0,
                        rep_raw,
                        lambda fh: jnp.zeros((), jnp.float32),
                        fake_h,
                    )
                else:
                    rep = rep_raw(fake_h)
                    rep_every = 1
            else:
                rep = jnp.zeros((), jnp.float32)
                rep_every = 1
            total = (adv_w * g_adv + nce_w * nce + fm_w * fm
                     + pal_w * pal + rep_w * rep_every * rep)
            return total, (g_adv, nce, fm, pal, rep)

        (head_loss, (g_adv, nce, fm, pal, rep)), head_grads = jax.value_and_grad(
            head_fn, argnums=(0, 1), has_aux=True
        )(fake, tgt_feats)
        zeros_src = [jnp.zeros_like(s) for s in src_feats]
        (g_grads,) = g_vjp((head_grads[0].astype(fake.dtype), zeros_src,
                            [t.astype(f.dtype) for t, f in
                             zip(head_grads[1], tgt_feats)]))

        # identity loss (static branch: compiled out of the post-warmup step
        # variants entirely); fp32 island optional — see __init__
        if do_identity:
            idt_gen = self.generator_f32 if self.identity_fp32 else self.generator

            def idt_loss_fn(p):
                rec = idt_gen.apply(
                    {"params": p},
                    monets.astype(jnp.float32 if self.identity_fp32
                                  else self.policy.compute_dtype),
                    style_key=style("style_idt"),
                )
                return identity_loss(rec, monets)

            idt, idt_grads = jax.value_and_grad(idt_loss_fn)(state.g_params)
            g_grads = jax.tree_util.tree_map(
                lambda g, ig: g + identity_weight * ig, g_grads, idt_grads
            )
        else:
            idt = jnp.zeros((), jnp.float32)

        g_loss = head_loss + identity_weight * idt
        g_updates, opt_g_state = self.opt_g.update(g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        ema = ema_update(state.ema, g_params, ema_decay)

        new_state = state.replace(
            step=step + 1,
            g_params=g_params,
            d_params=d_params,
            d_spectral=d_spectral,
            opt_g=opt_g_state,
            opt_d=opt_d_state,
            ema=ema,
        )
        losses = {
            "d_loss": d_loss,
            "g_loss": g_loss,
            "g_adv": g_adv,
            "nce": nce,
            "identity": idt,
            "r1": r1_value,
            "identity_weight": identity_weight,
            "featmatch": fm,
            "palette": pal,
            "repulsion": rep,
        }
        return new_state, losses

    # ------------------------------------------------------------------ #

    def generate(self, state: CUTTrainState, images, use_ema: bool = True):
        """Inference forward (bf16) on preprocessed [−1,1] images.

        ``use_ema`` selects the EMA shadow (the inference default, matching
        the reference's EMA-first restore, generate_folder.py:127-167) vs the
        raw generator params."""
        params = state.ema if use_ema else state.g_params
        return self.generator.apply({"params": params}, images)

    def checkpoint_payload(self, state: CUTTrainState) -> dict:
        """The reference checkpoint schema (io_ckpt.py:56-87), msgpack-side."""
        return {
            "generator": state.g_params,
            "discriminator": state.d_params,
            "d_spectral": state.d_spectral,
            "opt_G": state.opt_g,
            "opt_D": state.opt_d,
            "ema_G": {"decay": (self.config.get("ema") or {}).get("decay", 0.999),
                      "shadow": state.ema},
            "base_key": jax.random.key_data(state.base_key),
        }

    def state_from_payload(self, payload: dict, step: int) -> CUTTrainState:
        template = self.init_state()
        restored = flax_restore(template, payload, step)
        return replicate_state(restored, self.mesh)


def flax_restore(template: CUTTrainState, payload: dict, step: int) -> CUTTrainState:
    """Rebuild a train state from a checkpoint payload dict (host leaves;
    the PRNG key is carried as raw uint32 key data until replicate_state
    wraps it on device)."""
    import flax.serialization as ser

    def like(target, data):
        return ser.from_state_dict(target, data)

    return template.replace(
        step=jnp.asarray(step, jnp.int32),
        g_params=like(template.g_params, payload["generator"]),
        d_params=like(template.d_params, payload["discriminator"]),
        d_spectral=like(template.d_spectral, payload.get("d_spectral", {})),
        opt_g=like(template.opt_g, payload["opt_G"]),
        opt_d=like(template.opt_d, payload["opt_D"]),
        ema=like(template.ema, payload["ema_G"]["shadow"]),
        base_key=np.asarray(payload["base_key"]),
    )


def replicate_state(state, mesh: MeshContext):
    """Place a restored (host-leaf) train state on the mesh, replicated.

    A jitted identity rather than ``jax.device_put(state, replicated)``:
    device_put rejects shardings that span non-addressable devices, so the
    direct put breaks exactly in the multi-host case resume must support
    (every process holds the identical host data, which is what makes the
    jit-input-as-replicated contract valid). The raw uint32 key data rides
    through the jit and is wrapped back into a typed PRNG key inside."""
    from functools import partial as _partial

    @_partial(jax.jit, out_shardings=mesh.replicated())
    def _rep(tree):
        return tree.replace(base_key=jax.random.wrap_key_data(tree.base_key))

    return _rep(state)
