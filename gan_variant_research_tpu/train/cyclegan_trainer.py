"""CycleGAN baseline training — one donated jitted step (Basic_GAN parity).

Semantics matched against Basic_GAN/src/train.py:33-137:

- G step: joint update of both generators from one total loss —
  adv(D_B(fake_B)) + adv(D_A(fake_A)) + λ_cyc·(L1(rec_A,A)+L1(rec_B,B)) +
  λ_id·(L1(idt_A,A)+L1(idt_B,B)) — with a single Adam over the combined
  parameter tree (the reference's joint optimizer, :45-48);
- D_A step on (A, stop_grad(fake_A)), D_B step on (B, stop_grad(fake_B)),
  each 0.5·(real+fake) (:99-114);
- LSGAN (MSE) or BCE adversarial losses (src/losses.py:5-24);
- LR: constant then linear decay to 0 from ``lr_decay_after`` epochs
  (LambdaLR rule :27-31), expressed as a step-based optax schedule with
  epoch granularity;
- no grad clipping on any net (the reference clips nothing here).

The generator is the ResNet-9 (bias-free convs, Basic_GAN/src/models.py:23)
or the notebook-lineage U-Net (``model.generator: unet``, SURVEY.md §2.5).
Augmentation (resize load_size → random-crop → flip) runs on device.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gan_variant_research_tpu.core.precision import Policy, policy_from_config
from gan_variant_research_tpu.core.prng import step_keys
from gan_variant_research_tpu.data.augment import cyclegan_augment
from gan_variant_research_tpu.losses import cycle_loss, gan_loss, identity_loss
from gan_variant_research_tpu.models import (
    PatchGANDiscriminator,
    ResNetGenerator,
    UNetGenerator,
)
from gan_variant_research_tpu.parallel.mesh import MeshContext, create_mesh
from gan_variant_research_tpu.train.optim import make_optimizer


class CycleGANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any           # {"G_A2B": ..., "G_B2A": ...} — one joint tree
    da_params: Any
    db_params: Any
    da_spectral: Any
    db_spectral: Any
    opt_g: Any
    opt_da: Any
    opt_db: Any
    base_key: jax.Array


def _build_generator(model_cfg: dict, policy: Policy):
    kind = model_cfg.get("generator", "resnet")
    if kind == "unet":
        return UNetGenerator(
            ngf=model_cfg.get("ngf", 64),
            dtype=policy.compute_dtype,
            param_dtype=policy.param_dtype,
        )
    return ResNetGenerator(
        ngf=model_cfg.get("ngf", 64),
        n_blocks=model_cfg.get("n_blocks", 9),
        use_bias=False,  # Basic_GAN convs are bias-free (src/models.py:12-52)
        pad_free=model_cfg.get("pad_free", False),
        use_s2d=model_cfg.get("use_s2d", True),
        dtype=policy.compute_dtype,
        param_dtype=policy.param_dtype,
    )


class CycleGANTrainer:
    def __init__(self, config: dict, mesh: MeshContext | None = None,
                 steps_per_epoch: int | None = None):
        from gan_variant_research_tpu.core.cache import enable_persistent_cache

        enable_persistent_cache()
        self.config = config
        self.policy = policy_from_config(config)
        par_cfg = config.get("parallel") or {}
        self.mesh = mesh or create_mesh(
            num_devices=par_cfg.get("num_devices"),
            data_axis=par_cfg.get("data_axis", "data"),
        )

        model_cfg = config["model"]
        n_blocks = model_cfg.get("n_blocks", 9)
        if model_cfg.get("generator", "resnet") == "resnet" and n_blocks not in (6, 9):
            raise ValueError("CycleGAN baseline uses 6 or 9 res blocks")
        self.generator = _build_generator(model_cfg, self.policy)
        self.discriminator = PatchGANDiscriminator(
            ndf=model_cfg.get("ndf", 64),
            n_layers=model_cfg.get("n_layers", 3),
            norm="instance",
            use_spectral_norm=model_cfg.get("spectral_norm_d", False),
            dtype=self.policy.compute_dtype,
            param_dtype=self.policy.param_dtype,
        )

        opt_cfg = config["optim"]
        t_cfg = config["training"]
        self.steps_per_epoch = steps_per_epoch or 1
        total_steps = t_cfg["epochs"] * self.steps_per_epoch
        decay_start_epoch = opt_cfg.get("lr_decay_after", t_cfg["epochs"])

        def epoch_decay(lr):
            # LambdaLR rule with epoch granularity (train.py:27-31)
            def schedule(count):
                epoch = count // self.steps_per_epoch
                frac = (epoch - decay_start_epoch) / max(
                    1, t_cfg["epochs"] - decay_start_epoch
                )
                factor = jnp.clip(1.0 - frac, 0.0, 1.0)
                return lr * jnp.where(epoch < decay_start_epoch, 1.0, factor)

            return schedule

        betas = tuple(opt_cfg.get("betas", [0.5, 0.999]))
        self.opt_g = make_optimizer(betas=betas, schedule=epoch_decay(float(opt_cfg["lr_g"])))
        self.opt_da = make_optimizer(betas=betas, schedule=epoch_decay(float(opt_cfg["lr_d"])))
        self.opt_db = make_optimizer(betas=betas, schedule=epoch_decay(float(opt_cfg["lr_d"])))

        self.gan_mode = config.get("loss", {}).get("gan", "lsgan")
        if self.gan_mode not in ("lsgan", "bce"):
            raise ValueError(f"loss.gan must be lsgan|bce, got {self.gan_mode}")

        runtime = config.get("runtime") or {}
        # raises on the backends where donation is measured-broken
        from gan_variant_research_tpu.parallel.mesh import validate_donation

        donate = validate_donation(bool(runtime.get("donate", False)))
        # loops consult this to snapshot checkpoint payloads before the next
        # donated step invalidates the captured buffers (AsyncCheckpointer)
        self.donate = donate
        rep = self.mesh.replicated()
        bsh = self.mesh.batch_sharding(4)
        self.train_step = jax.jit(
            self._train_step,
            donate_argnums=(0,) if donate else (),
            in_shardings=(rep, bsh, bsh),
            out_shardings=(rep, rep),
        )
        # Multi-step window: lax.scan over K steps in one dispatch — the
        # same dispatch-latency amortization as CUTTrainer._jit_scan, and
        # MORE valuable here: the reference's Basic_GAN regime is batch 1
        # (configs/baseline.yaml), where the measured step is dispatch-bound
        # (52.8 ms/step at batch 1 vs ~30 ms of compute; docs/PERF.md).
        from jax.sharding import NamedSharding, PartitionSpec as P

        window_sh = NamedSharding(
            self.mesh.mesh, P(None, self.mesh.data_axis, None, None, None)
        )
        self._jit_scan = jax.jit(
            self._train_scan,
            donate_argnums=(0,) if donate else (),
            in_shardings=(rep, window_sh, window_sh),
            out_shardings=(rep, rep),
        )

    def init_state(self, seed: int | None = None) -> CycleGANTrainState:
        seed = seed if seed is not None else self.config["training"].get("seed", 0)
        size = self.config["data"].get("img_size", 256)

        # jitted init: eager flax .init is ~1 min of tiny dispatches over the
        # axon tunnel; fused it is sub-second (see CUTTrainer.init_state)
        @partial(jax.jit, out_shardings=self.mesh.replicated())
        def _init(seed_arr):
            key = jax.random.key(seed_arr)
            k1, k2, k3, k4, krun = jax.random.split(key, 5)
            dummy = jnp.zeros((1, size, size, 3), jnp.float32)
            gab = self.generator.init(k1, dummy)["params"]
            gba = self.generator.init(k2, dummy)["params"]
            da_vars = self.discriminator.init(k3, dummy)
            db_vars = self.discriminator.init(k4, dummy)
            g_params = {"G_A2B": gab, "G_B2A": gba}
            return CycleGANTrainState(
                step=jnp.zeros((), jnp.int32),
                g_params=g_params,
                da_params=da_vars["params"],
                db_params=db_vars["params"],
                da_spectral=da_vars.get("spectral", {}),
                db_spectral=db_vars.get("spectral", {}),
                opt_g=self.opt_g.init(g_params),
                opt_da=self.opt_da.init(da_vars["params"]),
                opt_db=self.opt_db.init(db_vars["params"]),
                base_key=krun,
            )

        return _init(jnp.asarray(seed, jnp.uint32))

    def _apply_g(self, params, x):
        return self.generator.apply({"params": params}, x)

    def _apply_d(self, params, spectral, x, update_sn=False):
        variables = {"params": params}
        if spectral:
            variables["spectral"] = spectral
            if update_sn:
                out, mut = self.discriminator.apply(
                    variables, x, update_sn=True, mutable=["spectral"]
                )
                return out, mut["spectral"]
            return self.discriminator.apply(variables, x), spectral
        return self.discriminator.apply(variables, x), spectral

    def _g_loss(self, g_params, state, real_A, real_B):
        """Joint generator loss (train.py:72-97), batched form — see the
        comment at the call site in :meth:`_train_step`."""
        loss_cfg = self.config.get("loss") or {}
        lam_cyc = float(loss_cfg.get("lambda_cycle", 10.0))
        lam_id = float(loss_cfg.get("lambda_identity", 0.5))

        nb = real_A.shape[0]
        out_ab = self._apply_g(
            g_params["G_A2B"], jnp.concatenate([real_A, real_B], axis=0)
        )
        fake_B, idt_B = out_ab[:nb], out_ab[nb:]
        out_ba = self._apply_g(
            g_params["G_B2A"],
            jnp.concatenate(
                [real_B, real_A, fake_B.astype(real_B.dtype)], axis=0
            ),
        )
        fake_A, idt_A, rec_A = out_ba[:nb], out_ba[nb:2 * nb], out_ba[2 * nb:]
        rec_B = self._apply_g(g_params["G_A2B"], fake_A)

        pred_B, _ = self._apply_d(state.db_params, state.db_spectral, fake_B)
        pred_A, _ = self._apply_d(state.da_params, state.da_spectral, fake_A)
        loss_adv = gan_loss(pred_B, True, self.gan_mode) + gan_loss(
            pred_A, True, self.gan_mode
        )
        loss_cyc = cycle_loss(rec_A, real_A, lam_cyc) + cycle_loss(
            rec_B, real_B, lam_cyc
        )
        loss_id = lam_id * (
            identity_loss(idt_A, real_A) + identity_loss(idt_B, real_B)
        )
        total = loss_adv + loss_cyc + loss_id
        return total, (fake_A, fake_B, loss_adv, loss_cyc, loss_id)

    def _train_step(self, state: CycleGANTrainState, a_u8, b_u8):
        cfg = self.config
        crop = int(cfg["data"].get("img_size", 256))

        keys = step_keys(state.base_key, state.step, ("aug_a", "aug_b"))
        real_A = cyclegan_augment(keys["aug_a"], a_u8, crop)
        real_B = cyclegan_augment(keys["aug_b"], b_u8, crop)

        # ---- G joint update (train.py:72-97) ----
        # The reference runs SIX sequential generator applies (fake_B, rec_A,
        # fake_A, rec_B, idt_B, idt_A — train.py:72-93); at its batch-1
        # regime each one is a 1-sample conv stack that badly underfeeds the
        # MXU. Both generators are per-sample networks (convs + instance
        # norm, no cross-batch coupling), so batching along the leading axis
        # is EXACT: the same three outputs come from three applies —
        #   G_A2B(concat(real_A, real_B))            → fake_B, idt_B
        #   G_B2A(concat(real_B, real_A, fake_B))    → fake_A, idt_A, rec_A
        #   G_A2B(fake_A)                            → rec_B
        # — gradient-identical to the sequential form (the loss is the same
        # function of the same leaves; see test_batched_g_matches_sequential).
        (loss_G, (fake_A, fake_B, loss_adv, loss_cyc, loss_id)), g_grads = (
            jax.value_and_grad(self._g_loss, has_aux=True)(
                state.g_params, state, real_A, real_B
            )
        )
        g_upd, opt_g = self.opt_g.update(g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_upd)

        fake_A = jax.lax.stop_gradient(fake_A)
        fake_B = jax.lax.stop_gradient(fake_B)

        # ---- D_A / D_B updates (train.py:99-116), batched real+fake ----
        def d_loss_fn(params, spectral, real, fake):
            both = jnp.concatenate([real, fake], axis=0)
            preds, new_spec = self._apply_d(params, spectral, both, update_sn=True)
            nb = real.shape[0]
            loss = 0.5 * (
                gan_loss(preds[:nb], True, self.gan_mode)
                + gan_loss(preds[nb:], False, self.gan_mode)
            )
            return loss, new_spec

        (loss_D_A, da_spec), da_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.da_params, state.da_spectral, real_A, fake_A
        )
        da_upd, opt_da = self.opt_da.update(da_grads, state.opt_da, state.da_params)
        da_params = optax.apply_updates(state.da_params, da_upd)

        (loss_D_B, db_spec), db_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.db_params, state.db_spectral, real_B, fake_B
        )
        db_upd, opt_db = self.opt_db.update(db_grads, state.opt_db, state.db_params)
        db_params = optax.apply_updates(state.db_params, db_upd)

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params,
            da_params=da_params,
            db_params=db_params,
            da_spectral=da_spec,
            db_spectral=db_spec,
            opt_g=opt_g,
            opt_da=opt_da,
            opt_db=opt_db,
        )
        # G/D_A/D_B match the reference's logged keys (train.py:118-122);
        # adv/cycle/idt are additive diagnostics
        losses = {"G": loss_G, "D_A": loss_D_A, "D_B": loss_D_B,
                  "adv": loss_adv, "cycle": loss_cyc, "idt": loss_id}
        return new_state, losses

    def _train_scan(self, state, a_w, b_w):
        def body(st, batch):
            a, b = batch
            return self._train_step(st, a, b)

        return jax.lax.scan(body, state, (a_w, b_w))

    def train_window(self, state, a_w, b_w):
        """Run K = a_w.shape[0] consecutive steps in ONE dispatch (a
        ``lax.scan`` entirely on device) — exactly equivalent to K
        ``train_step`` calls: unlike CUT's step, this one has no
        step-indexed Python branches, and the per-epoch LR decay reads the
        optimizer's own update count, which advances inside the scan.
        Returns (state, stacked losses with leading dim K)."""
        return self._jit_scan(state, a_w, b_w)

    def checkpoint_payload(self, state: CycleGANTrainState) -> dict:
        """Reference checkpoint dict schema (train.py:126-137)."""
        return {
            "G_A2B": state.g_params["G_A2B"],
            "G_B2A": state.g_params["G_B2A"],
            "D_A": state.da_params,
            "D_B": state.db_params,
            "da_spectral": state.da_spectral,
            "db_spectral": state.db_spectral,
            "optim_G": state.opt_g,
            "optim_D_A": state.opt_da,
            "optim_D_B": state.opt_db,
            "base_key": jax.random.key_data(state.base_key),
        }

    def state_from_payload(self, payload: dict, step: int) -> CycleGANTrainState:
        import flax.serialization as ser
        import numpy as np

        from gan_variant_research_tpu.train.cut_trainer import replicate_state

        template = self.init_state()
        like = lambda t, d: ser.from_state_dict(t, d)
        restored = template.replace(
            step=jnp.asarray(step, jnp.int32),
            g_params={
                "G_A2B": like(template.g_params["G_A2B"], payload["G_A2B"]),
                "G_B2A": like(template.g_params["G_B2A"], payload["G_B2A"]),
            },
            da_params=like(template.da_params, payload["D_A"]),
            db_params=like(template.db_params, payload["D_B"]),
            da_spectral=like(template.da_spectral, payload.get("da_spectral", {})),
            db_spectral=like(template.db_spectral, payload.get("db_spectral", {})),
            opt_g=like(template.opt_g, payload["optim_G"]),
            opt_da=like(template.opt_da, payload["optim_D_A"]),
            opt_db=like(template.opt_db, payload["optim_D_B"]),
            base_key=np.asarray(payload["base_key"]),
        )
        # multi-host-safe replicated placement (see cut_trainer.replicate_state)
        return replicate_state(restored, self.mesh)
