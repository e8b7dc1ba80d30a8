"""gvr-ckpt-info: checkpoint inspection without model code."""

import json

import jax
import jax.numpy as jnp
import pytest

from gan_variant_research_tpu.cli.ckpt_info import describe_checkpoint, main
from gan_variant_research_tpu.core.precision import DEFAULT_POLICY
from gan_variant_research_tpu.train.checkpoint import save_checkpoint
from gan_variant_research_tpu.train.cut_trainer import build_generator

GEN_CFG = {"ngf": 4, "n_blocks": 2}


def _params(seed=0):
    gen = build_generator(GEN_CFG, DEFAULT_POLICY)
    return jax.jit(
        lambda: gen.init(jax.random.key(seed),
                         jnp.zeros((1, 16, 16, 3)))["params"])()


@pytest.fixture(scope="module")
def cut_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_info")
    params = _params()
    path = d / "ckpt_step100.msgpack"
    save_checkpoint(
        path, 100,
        {"generator": params,
         "ema_G": {"decay": 0.999, "shadow": params},
         "opt_G": {"count": jnp.zeros(())},
         "base_key": jax.random.key_data(jax.random.key(0))},
        config={"model": {"generator": GEN_CFG}, "image_size": 16,
                "runtime": {"precision": "bf16"}},
    )
    return path, params


def test_describe_cut_checkpoint(cut_ckpt):
    path, params = cut_ckpt
    info = describe_checkpoint(path)
    assert info["family"] == "cut" and info["step"] == 100
    assert info["has_ema"] and info["has_prng_key"] and info["optimizer_state"]
    n = sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
    assert info["trees"]["generator"]["parameters"] == n
    assert info["trees"]["ema_G.shadow"]["parameters"] == n
    assert info["model_config"] == {"generator": GEN_CFG}
    assert info["image_size"] == 16 and info["precision"] == "bf16"


def test_describe_cyclegan_checkpoint(tmp_path):
    params = _params()
    path = tmp_path / "cyc.msgpack"
    save_checkpoint(path, 7, {"G_A2B": params, "G_B2A": params,
                              "optim_G": {"count": jnp.zeros(())}})
    info = describe_checkpoint(path)
    assert info["family"] == "cyclegan"
    assert not info["has_ema"] and not info["has_prng_key"]
    assert info["optimizer_state"]
    assert set(info["trees"]) == {"G_A2B", "G_B2A"}


def test_cli_json_and_summary(cut_ckpt, capsys):
    path, _ = cut_ckpt
    main(["--ckpt", str(path), "--json"])
    info = json.loads(capsys.readouterr().out)
    assert info["step"] == 100
    main(["--ckpt", str(path)])
    out = capsys.readouterr().out
    assert "family:     cut" in out and "EMA shadow: True" in out
