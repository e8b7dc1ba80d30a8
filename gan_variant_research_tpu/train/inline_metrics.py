"""Training-time metrics + early stopping: the deleted ``metrics/`` layer.

The reference removed its entire ``metrics/`` folder (clip_knn_distance.py,
fid_inception.py), the ``evaluate_metrics()`` hook, and the
``EarlyStoppingTracker`` class in the baseline reversion
(Documentation/BASELINE_REVERSION.md §3) — but kept the config surface:
``metrics.{compute_fid, compute_clip_distance, eval_every}``,
``eval.num_samples`` and the full ``early_stop`` block
(configs/train_gan_cutpp.yaml:103-116). This is the working re-design.

TPU-native shape: one frozen InceptionV3-pool3 embedder (the in-tree FID
net — CLIP weights are unreachable here, and pool3 is the space the Kaggle
metric scores) serves BOTH inline metrics:

- **fid** — Fréchet distance between the pool3 stats of ``eval.num_samples``
  EMA-generated probes and the precomputed Monet feature bank (the same
  bank the repulsion loss uses; its Gaussian stats are computed once).
- **d_min** — mean min cosine distance from probe embeddings to the bank,
  the memorization monitor (the "CLIP distance" analog; a collapsing d_min
  means the generator is memorizing training images).

``EarlyStoppingTracker`` semantics (re-designed from the surviving config
keys): FID must improve by more than ``fid_plateau_threshold`` within
``patience`` consecutive evaluations, and d_min must not drop BELOW
``dmin_drop_threshold`` (an absolute memorization floor that fires
immediately, not on patience). The floor semantics match the domain's own
memorization test — Kaggle's MiFID applies its penalty when the mean min
cosine distance falls under ``cosine_eps`` (0.1, EVAL/eval/cli.py defaults)
— and, unlike a drop-relative-to-maximum rule, do not fire on ordinary
convergence: d_min legitimately decreases from its untrained-model value as
the generator learns the target style; only a collapse toward zero (fakes
becoming near-copies of bank images) crosses the floor.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


class EarlyStoppingTracker:
    """Stateful stop-decision over inline metric snapshots."""

    _CONFIG_KEYS = ("enable", "patience", "fid_plateau_threshold",
                    "dmin_drop_threshold")

    @classmethod
    def from_config(cls, es_cfg: dict) -> "EarlyStoppingTracker":
        """Build from a config ``early_stop`` dict, failing loudly on typos:
        CUT_SCHEMA types early_stop as a bare dict, so a misspelled key
        ("patince") would otherwise be silently dropped and the default
        would apply — the silent-config-drift class the schema exists to
        prevent."""
        unknown = sorted(set(es_cfg) - set(cls._CONFIG_KEYS))
        if unknown:
            raise ValueError(
                f"Unknown early_stop config key(s) {unknown}; "
                f"valid keys: {list(cls._CONFIG_KEYS)}")
        return cls(**{k: es_cfg[k] for k in cls._CONFIG_KEYS if k in es_cfg})

    def __init__(self, enable: bool = False, patience: int = 5,
                 fid_plateau_threshold: float = 1.0,
                 dmin_drop_threshold: float = 0.01):
        self.enable = bool(enable)
        self.patience = int(patience)
        self.fid_plateau_threshold = float(fid_plateau_threshold)
        self.dmin_drop_threshold = float(dmin_drop_threshold)
        self.best_fid = math.inf
        self.strikes = 0
        self.reason: str | None = None

    def update(self, fid: float | None = None,
               d_min: float | None = None) -> bool:
        """Feed one evaluation; returns True when training should stop."""
        if not self.enable:
            return False
        if fid is not None:
            if fid < self.best_fid - self.fid_plateau_threshold:
                self.best_fid = fid
                self.strikes = 0
            else:
                self.strikes += 1
                if self.strikes >= self.patience:
                    self.reason = (
                        f"FID plateau: no improvement > "
                        f"{self.fid_plateau_threshold} in {self.patience} "
                        f"evals (best {self.best_fid:.3f})"
                    )
                    return True
        if d_min is not None and d_min < self.dmin_drop_threshold:
            self.reason = (
                f"memorization alarm: d_min dropped to {d_min:.4f}, below "
                f"the {self.dmin_drop_threshold} floor (fakes are "
                "near-copies of feature-bank images)"
            )
            return True
        return False


class InlineEvaluator:
    """Periodic training-time FID / d_min on a fixed probe batch.

    Deterministic: the probe photos are the first ``eval.num_samples``
    sorted photos, decoded once at construction. Generation uses the EMA
    shadow (the inference path). Single-process only — on a pod, offline
    evaluation through the EVAL suite is the supported path.
    """

    def __init__(self, config: dict):
        from gan_variant_research_tpu.data.loader import make_source
        from gan_variant_research_tpu.evalsuite.frechet import gaussian_stats
        from gan_variant_research_tpu.train.feature_bank import (
            ensure_feature_bank,
            load_inception_params,
            make_embed_fn,
        )

        metrics_cfg = config.get("metrics") or {}
        self.compute_fid = bool(metrics_cfg.get("compute_fid", False))
        self.compute_distance = bool(
            metrics_cfg.get("compute_clip_distance", False))
        if not (self.compute_fid or self.compute_distance):
            raise ValueError("InlineEvaluator built with every metric off")
        # metrics.eval_every and eval.every_steps are aliases (the reference
        # ships BOTH as dead keys of its deleted metrics layer,
        # train_gan_cutpp.yaml:106,99): honor either, error on disagreement
        # — same rule as the checkpoint cadence (train/loop.py)
        m = metrics_cfg.get("eval_every")
        e = (config.get("eval") or {}).get("every_steps")
        if m is not None and e is not None and int(m) != int(e):
            raise ValueError(
                f"metrics.eval_every={m} and eval.every_steps={e} disagree; "
                "they are aliases for the inline-metrics cadence — set both "
                "to the same value or drop one from the config.")
        self.eval_every = int(m if m is not None else (e if e is not None
                                                       else 500))

        from gan_variant_research_tpu.train.feature_bank import (
            monet_source_path,
        )

        clip_cfg = config.get("clip_features") or {}
        bank = ensure_feature_bank(
            clip_cfg, monet_source_path(config.get("data")))
        self._bank = jnp.asarray(bank, jnp.float32)
        self._mu_real, self._sigma_real = gaussian_stats(bank)
        self._embed = jax.jit(make_embed_fn(load_inception_params(clip_cfg)))

        num_samples = int((config.get("eval") or {}).get("num_samples", 10))
        size = int(config.get("image_size", 256))
        # probe photos through make_source, mirroring the training loader's
        # input selection: folder OR TFRecord shards (data.use_tfrec)
        data_cfg = config["data"]
        photos_path = (data_cfg["photos_tfrec"] if data_cfg.get("use_tfrec")
                       else data_cfg["photos_dir"])
        source = make_source(photos_path, size)
        n = min(num_samples, len(source))
        if n == 0:
            raise FileNotFoundError("no probe photos for inline metrics")
        probe_u8 = np.stack([source.get(i) for i in range(n)])
        self._probe = jnp.asarray(
            (probe_u8.astype(np.float32) / 255.0) * 2.0 - 1.0)
        self._gen_jit = None  # jitted EMA generate, built on first evaluate

    def evaluate(self, trainer, state) -> dict:
        from gan_variant_research_tpu.evalsuite.frechet import (
            frechet_distance,
            gaussian_stats,
        )
        from gan_variant_research_tpu.losses import min_cosine_distances

        if self._gen_jit is None:
            # jitted: an eager flax apply dispatches hundreds of individual
            # ops (minutes over a remote-device tunnel)
            gen = trainer.generator
            self._gen_jit = jax.jit(
                lambda p, x: gen.apply({"params": p}, x))
        fakes = self._gen_jit(state.ema, self._probe)        # EMA params
        feats = self._embed(fakes.astype(jnp.float32))
        out: dict = {}
        if self.compute_fid:
            mu_f, sigma_f = gaussian_stats(np.asarray(feats))
            out["fid"] = float(frechet_distance(
                mu_f, sigma_f, self._mu_real, self._sigma_real))
        if self.compute_distance:
            out["d_min"] = float(
                jnp.mean(min_cosine_distances(feats, self._bank)))
        return out


def append_metrics_line(log_dir: str | Path, step: int, metrics: dict) -> None:
    """JSON-lines metrics log (metrics_log.jsonl) next to the loss logs."""
    path = Path(log_dir) / "metrics_log.jsonl"
    with open(path, "a") as f:
        f.write(json.dumps({"step": step, **metrics}) + "\n")
