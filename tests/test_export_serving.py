"""AOT serving-artifact export (cli/export_serving.py).

Contract: the serialized StableHLO artifact is self-contained (deserialize
+ call, no model code), batch-polymorphic, and byte-identical to the
in-framework serving forward (the generate_folder contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_variant_research_tpu.cli.export_serving import (
    export_serving,
    load_artifact,
    main,
    make_serve_fn,
)
from gan_variant_research_tpu.core.precision import DEFAULT_POLICY
from gan_variant_research_tpu.train.checkpoint import save_checkpoint
from gan_variant_research_tpu.train.cut_trainer import build_generator

GEN_CFG = {"ngf": 4, "n_blocks": 2}
SIZE = 32


def _tiny_params(seed: int):
    gen = build_generator(GEN_CFG, DEFAULT_POLICY)
    params = jax.jit(
        lambda: gen.init(jax.random.key(seed),
                         jnp.zeros((1, SIZE, SIZE, 3)))["params"]
    )()
    return gen, params


@pytest.fixture(scope="module")
def cut_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("export_serving")
    gen, params = _tiny_params(0)
    _, ema = _tiny_params(1)  # distinct EMA shadow
    path = d / "ckpt_final.msgpack"
    save_checkpoint(
        path, 0,
        {"generator": params, "ema_G": {"decay": 0.999, "shadow": ema}},
        config={"model": {"generator": GEN_CFG}},
    )
    return path, gen, params, ema


def _u8(b, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (b, SIZE, SIZE, 3), dtype=np.uint8)


def test_roundtrip_batch_polymorphic(cut_ckpt, tmp_path):
    path, gen, _, ema = cut_ckpt
    art = export_serving(path, tmp_path / "a.gvrserve", size=SIZE,
                         platforms=("cpu",))
    serve = load_artifact(art)
    direct = jax.jit(make_serve_fn(gen, ema, SIZE))
    for b in (1, 5):
        u8 = _u8(b, seed=b)
        out = np.asarray(serve(u8))
        assert out.shape == (b, SIZE, SIZE, 3) and out.dtype == np.uint8
        assert np.array_equal(out, np.asarray(direct(u8)))


def test_no_ema_bakes_raw_params(cut_ckpt, tmp_path):
    path, gen, raw, ema = cut_ckpt
    serve = load_artifact(export_serving(
        path, tmp_path / "raw.gvrserve", size=SIZE, use_ema=False,
        platforms=("cpu",)))
    u8 = _u8(2)
    out = np.asarray(serve(u8))
    assert np.array_equal(
        out, np.asarray(jax.jit(make_serve_fn(gen, raw, SIZE))(u8)))
    assert not np.array_equal(
        out, np.asarray(jax.jit(make_serve_fn(gen, ema, SIZE))(u8)))


def test_cyclegan_directions(tmp_path):
    from gan_variant_research_tpu.train.cyclegan_trainer import (
        _build_generator,
    )

    model_cfg = {"generator": "resnet", "ngf": 4, "n_blocks": 6}
    gen = _build_generator(model_cfg, DEFAULT_POLICY)
    init = lambda s: jax.jit(
        lambda: gen.init(jax.random.key(s),
                         jnp.zeros((1, SIZE, SIZE, 3)))["params"])()
    gab, gba = init(0), init(1)
    path = tmp_path / "cyc.msgpack"
    save_checkpoint(path, 0, {"G_A2B": gab, "G_B2A": gba},
                    config={"model": model_cfg})
    u8 = _u8(2)
    outs = {}
    for direction, params in (("A2B", gab), ("B2A", gba)):
        serve = load_artifact(export_serving(
            path, tmp_path / f"{direction}.gvrserve", size=SIZE,
            direction=direction, platforms=("cpu",)))
        outs[direction] = np.asarray(serve(u8))
        assert np.array_equal(
            outs[direction],
            np.asarray(jax.jit(make_serve_fn(gen, params, SIZE))(u8)))
    assert not np.array_equal(outs["A2B"], outs["B2A"])


def test_variant_checkpoint_serves_and_exports(tmp_path):
    """A checkpoint trained with the restored variant features (attention /
    channel attention / style dropout) reconstructs from its stored config
    and serves identically through generate_folder's loader and the
    StableHLO export (StyleGate is a no-op at inference — no key)."""
    from gan_variant_research_tpu.cli.generate_folder import (
        load_generator_params,
    )

    var_cfg = {"ngf": 4, "n_blocks": 2,
               "use_attention": True, "attn_layers": [1],
               "use_channel_attn": True, "channel_attn_layers": [1],
               "use_style_dropout": True}
    gen = build_generator(var_cfg, DEFAULT_POLICY)
    params = jax.jit(
        lambda: gen.init(jax.random.key(0),
                         jnp.zeros((1, SIZE, SIZE, 3)))["params"])()
    assert any(k.startswith(("attn_", "se_", "style_")) or "attn" in k
               for k in params), sorted(params)  # variant modules exist
    path = tmp_path / "variant.msgpack"
    save_checkpoint(path, 0,
                    {"generator": params,
                     "ema_G": {"decay": 0.999, "shadow": params}},
                    config={"model": {"generator": var_cfg}})

    loaded_gen, loaded_params, _ = load_generator_params(str(path))
    u8 = _u8(2)
    direct = np.asarray(jax.jit(make_serve_fn(gen, params, SIZE))(u8))
    via_loader = np.asarray(
        jax.jit(make_serve_fn(loaded_gen, loaded_params, SIZE))(u8))
    assert np.array_equal(via_loader, direct)

    serve = load_artifact(export_serving(
        path, tmp_path / "variant.gvrserve", size=SIZE, platforms=("cpu",)))
    assert np.array_equal(np.asarray(serve(u8)), direct)


def test_multiplatform_lowering_and_cli(cut_ckpt, tmp_path):
    """tpu+cpu lowering from a CPU host (the deploy-day flow), via main()."""
    path, gen, _, ema = cut_ckpt
    out = tmp_path / "multi.gvrserve"
    main(["--ckpt", str(path), "--out", str(out), "--size", str(SIZE)])
    serve = load_artifact(out)
    u8 = _u8(3)
    assert np.array_equal(
        np.asarray(serve(u8)),
        np.asarray(jax.jit(make_serve_fn(gen, ema, SIZE))(u8)))
