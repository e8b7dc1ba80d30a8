"""Data-parallel serving (generate_folder) parity.

The reference's inference loop is single-GPU (generate_folder.py:237-252);
the TPU-native CLI shards the generator forward over every local device
(GSPMD batch sharding). On the virtual 8-device CPU mesh these tests pin:
(1) the DP output tree is pixel-identical to the single-device run,
(2) a trailing partial batch is padded and the pad rows are dropped,
(3) a 1-device mesh stays the plain single-chip program (no rounding chatter).
"""

import numpy as np
import pytest
from PIL import Image

from gan_variant_research_tpu.cli.generate_folder import stylize_folder
from gan_variant_research_tpu.core.precision import DEFAULT_POLICY
from gan_variant_research_tpu.train.cut_trainer import build_generator


@pytest.fixture(scope="module")
def photos(tmp_path_factory):
    root = tmp_path_factory.mktemp("dp_serve")
    d = root / "photos"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(11):  # deliberately not divisible by 8 (trailing partial)
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(d / f"{i:03d}.jpg", quality=90)
    return d


@pytest.fixture(scope="module")
def generator_and_params():
    import jax

    gen = build_generator({"ngf": 4, "n_blocks": 2}, DEFAULT_POLICY)
    params = jax.jit(lambda: gen.init(
        jax.random.key(0), np.zeros((1, 32, 32, 3), np.float32)
    )["params"])()
    return gen, params


def _read_tree(out_dir):
    return {p.name: np.asarray(Image.open(p)) for p in sorted(out_dir.iterdir())}


def test_dp_outputs_match_single_device(photos, generator_and_params, tmp_path):
    gen, params = generator_and_params
    single = stylize_folder(gen, params, photos, tmp_path / "single",
                            size=32, batch=4, num_devices=1)
    dp = stylize_folder(gen, params, photos, tmp_path / "dp",
                        size=32, batch=4, num_devices=8)  # rounds batch to 8
    assert len(single) == len(dp) == 11
    s, d = _read_tree(tmp_path / "single"), _read_tree(tmp_path / "dp")
    assert s.keys() == d.keys()
    for name in s:
        # identical uint8 arrays encode to identical JPEGs; allow ±1 for
        # float round-to-nearest landing on exact halves across programs
        diff = np.abs(s[name].astype(int) - d[name].astype(int))
        assert diff.max() <= 1, f"{name}: max pixel diff {diff.max()}"


def test_dp_pads_trailing_batch(photos, generator_and_params, tmp_path, capsys):
    gen, params = generator_and_params
    written = stylize_folder(gen, params, photos, tmp_path / "out",
                             size=32, batch=3, num_devices=8)
    out = capsys.readouterr().out
    assert "Rounding batch to 8" in out
    assert "data-parallel over 8 devices" in out
    assert len(written) == 11  # pad rows never reach the output tree


def test_single_device_mesh_no_dp(photos, generator_and_params, tmp_path, capsys):
    gen, params = generator_and_params
    stylize_folder(gen, params, photos, tmp_path / "out",
                   size=32, batch=3, num_devices=1)
    out = capsys.readouterr().out
    assert "data-parallel" not in out


def test_dp_serves_attention_checkpoint(photos, tmp_path):
    """Variant (attention) generators under DP serving: stylize_folder
    wires the mesh into the attention blocks (the flash kernel needs an
    explicit shard_map on >1-device meshes; on this CPU mesh the route
    resolves to the einsum core either way) and the sharded rows must
    match the single-device run."""
    import jax

    gen = build_generator(
        {"ngf": 8, "n_blocks": 2, "use_attention": True, "attn_layers": [0]},
        DEFAULT_POLICY)
    params = jax.jit(lambda: gen.init(
        jax.random.key(1), np.zeros((1, 32, 32, 3), np.float32)
    )["params"])()
    single = stylize_folder(gen, params, photos, tmp_path / "single",
                            size=32, batch=4, num_devices=1)
    dp = stylize_folder(gen, params, photos, tmp_path / "dp",
                        size=32, batch=8, num_devices=8)
    assert len(single) == len(dp) == 11
    s, d = _read_tree(tmp_path / "single"), _read_tree(tmp_path / "dp")
    for name in s:
        diff = np.abs(s[name].astype(int) - d[name].astype(int))
        assert diff.max() <= 1, f"{name}: max pixel diff {diff.max()}"
