"""Tests for the re-designed k-NN repulsion loss (the reference's deleted
losses/repulsion_knn.py) and its feature-bank plumbing (the deleted
build_clip_features_if_needed) — Documentation/BASELINE_REVERSION.md §1."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gan_variant_research_tpu.losses import (
    min_cosine_distances,
    repulsion_loss,
)
from gan_variant_research_tpu.train.feature_bank import (
    build_feature_bank,
    ensure_feature_bank,
    load_feature_bank,
    load_margin,
    make_embed_fn,
    save_feature_bank,
)
from gan_variant_research_tpu.train.cut_trainer import CUTTrainer

from tests.test_cut_trainer import batches, tiny_config


# ------------------------------ pure loss ------------------------------- #


def test_min_cosine_distances_vs_numpy(rng):
    e = rng.normal(size=(5, 16)).astype(np.float32)
    b = rng.normal(size=(12, 16)).astype(np.float32)
    got = np.asarray(min_cosine_distances(jnp.asarray(e), jnp.asarray(b)))
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    want = 1.0 - (en @ bn.T).max(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_repulsion_hinge_semantics(rng):
    bank = rng.normal(size=(8, 16)).astype(np.float32)
    # a fake that IS a bank row (memorized) → d_min 0 → loss = margin
    memorized = jnp.asarray(bank[2:3])
    loss, d_min = repulsion_loss(memorized, jnp.asarray(bank), margin=0.3)
    assert float(d_min[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(loss) == pytest.approx(0.3, abs=1e-5)
    # an orthogonal fake (d_min = 1) is beyond the margin → zero loss
    ortho = jnp.zeros((1, 16)).at[0, 0].set(1.0)
    bank_perp = jnp.zeros((4, 16)).at[:, 1].set(1.0)
    loss2, d2 = repulsion_loss(ortho, bank_perp, margin=0.3)
    assert float(d2[0]) == pytest.approx(1.0, abs=1e-6)
    assert float(loss2) == 0.0


def test_repulsion_gradient_only_on_memorized(rng):
    bank = np.eye(4, dtype=np.float32)
    fakes = jnp.asarray(np.stack([
        bank[0] + 1e-3 * rng.normal(size=4).astype(np.float32),  # memorized
        np.array([1.0, 1.0, 1.0, 1.0], np.float32) * 10,         # far (d≈0.5)
    ]))
    g = jax.grad(
        lambda f: repulsion_loss(f, jnp.asarray(bank), margin=0.2)[0]
    )(fakes)
    assert float(jnp.max(jnp.abs(g[0]))) > 0          # pushes memorized fake
    assert float(jnp.max(jnp.abs(g[1]))) == 0.0       # leaves distant alone
    assert bool(jnp.all(jnp.isfinite(g)))


# ----------------------------- feature bank ----------------------------- #


def test_bank_roundtrip_and_margin(tmp_path, rng):
    feats = rng.normal(size=(6, 32)).astype(np.float32)
    save_feature_bank(tmp_path / "bank.npz", feats)
    np.testing.assert_array_equal(load_feature_bank(tmp_path / "bank.npz"), feats)
    assert load_margin(None, default=0.4) == 0.4
    assert load_margin(tmp_path / "missing.json", default=0.4) == 0.4
    (tmp_path / "m.json").write_text(json.dumps({"margin": 0.17}))
    assert load_margin(tmp_path / "m.json") == pytest.approx(0.17)
    (tmp_path / "m2.json").write_text(json.dumps({"distance_margin": 0.9}))
    assert load_margin(tmp_path / "m2.json") == pytest.approx(0.9)


def _write_images(d, rng, n=4):
    from PIL import Image
    d.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(d / f"{i}.jpg", quality=95)


def test_build_on_first_run_then_load(tmp_path, rng):
    imgs = tmp_path / "monet"
    _write_images(imgs, rng)
    cfg = {
        "backbone": "inception_pool3",
        "monet_feats_path": str(tmp_path / "bank.npz"),
        "build_on_first_run": True,
        "allow_random": True,     # pipeline test: random inception weights
    }
    bank = ensure_feature_bank(cfg, imgs)
    assert bank.shape == (4, 2048) and np.isfinite(bank).all()
    # second call loads the same file without rebuilding
    again = ensure_feature_bank(cfg, None)
    np.testing.assert_array_equal(again, bank)


def test_unsupported_backbone_fails_loudly(tmp_path):
    with pytest.raises(ValueError, match="CLIP"):
        ensure_feature_bank({"backbone": "ViT-B/32",
                             "monet_feats_path": "x.npz"}, None)
    with pytest.raises(FileNotFoundError):
        ensure_feature_bank({"monet_feats_path": str(tmp_path / "no.npz"),
                             "build_on_first_run": False}, None)


# --------------------------- train-step wiring -------------------------- #


def test_cut_step_with_repulsion(tmp_path, rng):
    bank = rng.normal(size=(16, 2048)).astype(np.float32)
    save_feature_bank(tmp_path / "bank.npz", bank)
    t = CUTTrainer(tiny_config(
        loss_weights={"adv": 1.0, "patchnce": 1.0, "identity_warm": 0.1,
                      "identity_final": 0.0, "repulsion": 1.0},
        repulsion={"enabled": True, "margin": 2.0},   # margin 2 → always active
        clip_features={"monet_feats_path": str(tmp_path / "bank.npz"),
                       "allow_random": True},
    ))
    # swap the Inception embedder for a cheap projection so the CPU test
    # stays fast; the real embedder is covered by test_embed_fn below
    proj = jnp.asarray(rng.normal(size=(3, 2048)).astype(np.float32))
    t._repulsion["embed"] = lambda x: jnp.mean(
        x.astype(jnp.float32), axis=(1, 2)) @ proj
    state = t.init_state()
    p, m = batches(rng)
    state, losses = t.train_step(state, p, m)
    vals = {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["repulsion"] > 0     # margin 2 ⇒ hinge always engaged


@pytest.mark.slow
def test_repulsion_cadence_semantics(tmp_path, rng):
    """repulsion.every=K is R1-style lazy amortization: active steps are
    gradient-identical to every=1 with the weight scaled ×K, off steps are
    gradient-identical to repulsion absent (the lax.cond zero branch adds
    exact zeros)."""
    bank = rng.normal(size=(16, 2048)).astype(np.float32)
    save_feature_bank(tmp_path / "bank.npz", bank)
    proj = jnp.asarray(rng.normal(size=(3, 2048)).astype(np.float32))

    def make(weight, every=None):
        rep = {"enabled": True, "margin": 2.0}   # margin 2 → hinge always on
        if every is not None:
            rep["every"] = every
        # every other loss weight is zero, so the G gradient IS the
        # repulsion term — a missing ×K scale or a wrong cadence predicate
        # shifts it by 2×, far above bf16 graph-divergence noise
        t = CUTTrainer(tiny_config(
            loss_weights={"adv": 0.0, "patchnce": 0.0, "identity_warm": 0.0,
                          "identity_final": 0.0, "repulsion": weight},
            repulsion=rep,
            clip_features={"monet_feats_path": str(tmp_path / "bank.npz"),
                           "allow_random": True},
        ))
        if t._repulsion is not None:
            t._repulsion["embed"] = lambda x: jnp.mean(
                x.astype(jnp.float32), axis=(1, 2)) @ proj
        return t

    p, m = batches(rng)

    def assert_same_grads(sa, sb):
        # Compare Adam's first/second moments after ONE step from identical
        # init: mu = (1-b1)·g is LINEAR in the gradient, so this pins
        # gradient equivalence without Adam's sign normalization (update ≈
        # lr·sign(g) for near-zero g) turning compiled-graph float noise
        # into whole ±lr param flips. Tolerances sized to bf16: the two
        # programs fuse differently, so entries can drift ~1e-2 relative —
        # a missing ×K or a wrong predicate shifts them 2×.
        for a, b in zip(jax.tree_util.tree_leaves(sa.opt_g),
                        jax.tree_util.tree_leaves(sb.opt_g)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(np.max(np.abs(a)), np.max(np.abs(b)), 1e-30)
            np.testing.assert_allclose(a, b, rtol=5e-2,
                                       atol=1e-3 * float(scale))

    # step 0 (0 % 2 == 0 → active): every=2 at w=0.5 ≡ every=1 at w=1.0
    t_k, t_2w = make(0.5, every=2), make(1.0)
    s_k, l_k = t_k.train_step(t_k.init_state(), p, m)
    s_2w, l_2w = t_2w.train_step(t_2w.init_state(), p, m)
    assert float(l_k["repulsion"]) == pytest.approx(
        float(l_2w["repulsion"]), rel=1e-5)          # logged value stays raw
    assert float(l_k["repulsion"]) > 0
    assert_same_grads(s_k, s_2w)

    # step 1 (off): every=2 ≡ repulsion compiled out entirely
    t_none = make(0.0)
    assert t_none._repulsion is None
    base_k = t_k.init_state()
    st1_k = base_k.replace(step=base_k.step + 1)
    base_n = t_none.init_state()
    st1_n = base_n.replace(step=base_n.step + 1)
    s_off, l_off = t_k.train_step(st1_k, p, m)
    s_non, l_non = t_none.train_step(st1_n, p, m)
    assert float(l_off["repulsion"]) == 0.0
    assert_same_grads(s_off, s_non)

    # guard: every must be a positive int
    with pytest.raises(ValueError, match="repulsion.every"):
        make(1.0, every=0)


def test_repulsion_enabled_gate(tmp_path, rng):
    # repulsion.enabled=false zeroes the loss even with a weight set — the
    # reference's surviving gate semantics (train_gan_cutpp.yaml:148-149)
    t = CUTTrainer(tiny_config(
        loss_weights={"adv": 1.0, "patchnce": 1.0, "identity_warm": 0.1,
                      "identity_final": 0.0, "repulsion": 1.0},
        repulsion={"enabled": False},
    ))
    assert t._repulsion is None
    state = t.init_state()
    p, m = batches(rng)
    _, losses = t.train_step(state, p, m)
    assert float(losses["repulsion"]) == 0.0


@pytest.mark.slow
def test_embed_fn_shapes_and_grad(rng):
    # the real differentiable embedder (random-weight inception): shape,
    # finiteness, and a nonzero gradient back into the image
    from gan_variant_research_tpu.train.feature_bank import load_inception_params

    params = load_inception_params({"allow_random": True})
    embed = make_embed_fn(params)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    feats = jax.jit(embed)(x)
    assert feats.shape == (2, 2048) and bool(jnp.all(jnp.isfinite(feats)))
    g = jax.grad(lambda im: jnp.sum(embed(im) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.max(jnp.abs(g))) > 0


def test_bank_normalized_flag_equivalence():
    """Pre-normalizing the bank once (what the trainer now does) must give
    the same distances as the self-normalizing form."""
    from gan_variant_research_tpu.losses.repulsion_knn import normalize_rows

    local = np.random.default_rng(11)
    e = jnp.asarray(local.normal(size=(4, 16)).astype(np.float32))
    b = jnp.asarray(local.normal(size=(8, 16)).astype(np.float32))
    ref = np.asarray(min_cosine_distances(e, b))
    got = np.asarray(
        min_cosine_distances(e, normalize_rows(b), bank_normalized=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
    lr, _ = repulsion_loss(e, b, margin=0.5)
    lg, _ = repulsion_loss(e, normalize_rows(b), margin=0.5,
                           bank_normalized=True)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(lr), rtol=1e-6)


@pytest.mark.slow
def test_build_feature_bank_from_tfrecord(tmp_path):
    """data.use_tfrec datasets can build the bank on first run: the tfrec
    branch decodes records at the extractor's 299² bilinear contract and
    must produce exactly the folder-built features for the same JPEGs."""
    import io

    from PIL import Image

    from gan_variant_research_tpu.data import tfrecord as tfr
    from gan_variant_research_tpu.train.feature_bank import build_feature_bank

    local = np.random.default_rng(21)
    folder = tmp_path / "monet"
    folder.mkdir()
    for i in range(3):
        Image.fromarray(
            local.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(folder / f"{i}.jpg", quality=92)
    shards = tmp_path / "monet_tfrec"
    shards.mkdir()
    tfr.write_tfrecord(shards / "part-00.tfrec", [
        tfr.make_example({"image_name": p.name, "image": p.read_bytes()})
        for p in sorted(folder.glob("*.jpg"))
    ])

    ref = build_feature_bank(folder, tmp_path / "bank_folder.npz",
                             allow_random=True, batch_size=2)
    got = build_feature_bank(shards, tmp_path / "bank_tfrec.npz",
                             allow_random=True, batch_size=2)
    assert got.shape == ref.shape == (3, 2048)
    np.testing.assert_array_equal(got, ref)
