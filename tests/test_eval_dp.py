"""Data-parallel eval feature extraction (GSPMD batch sharding).

The reference's extractor is single-GPU (EVAL/eval/features.py:17-118); the
TPU-native equivalent layer shards the inception forward over the device
mesh. These tests run on the virtual 8-device CPU mesh (conftest) and pin:
(1) DP features are identical to the single-device program row for row,
(2) the forward really is sharded — each device owns a batch slice,
(3) the batch-divisibility contract fails loudly.
"""

import jax
import numpy as np
import pytest

from gan_variant_research_tpu.evalsuite.features import InceptionFeatureExtractor
from gan_variant_research_tpu.parallel.mesh import create_mesh

from tests.test_evalsuite import _make_image_folder


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("dp_imgs")
    _make_image_folder(folder, n=12, seed=7, size=40)
    return folder


def _paths(folder):
    return sorted(folder.iterdir())


def test_dp_features_match_single_device(image_folder):
    # same deterministic random init (key 0) on both nets
    single = InceptionFeatureExtractor(None, allow_random=True, batch_size=8)
    dp = InceptionFeatureExtractor(None, allow_random=True, batch_size=8,
                                   mesh=create_mesh(8))
    f_single = single.extract(_paths(image_folder), verbose=False)
    f_dp = dp.extract(_paths(image_folder), verbose=False)
    assert f_dp.shape == f_single.shape == (12, 2048)
    np.testing.assert_allclose(f_dp, f_single, rtol=0, atol=1e-5)


def test_dp_forward_is_actually_sharded(image_folder):
    mesh = create_mesh(8)
    dp = InceptionFeatureExtractor(None, allow_random=True, batch_size=8,
                                   mesh=mesh)
    batch = np.zeros((8, 299, 299, 3), np.uint8)
    staged = jax.device_put(batch, mesh.batch_sharding(4))
    out = dp.net._features(staged)
    assert out.sharding.is_equivalent_to(mesh.batch_sharding(2), ndim=2)
    # every device owns exactly one row of the batch
    assert len(out.addressable_shards) == 8
    assert all(s.data.shape == (1, 2048) for s in out.addressable_shards)


def test_dp_requires_divisible_batch():
    with pytest.raises(ValueError, match="divisible"):
        InceptionFeatureExtractor(None, allow_random=True, batch_size=6,
                                  mesh=create_mesh(8))


def test_one_device_mesh_is_plain_single_chip():
    ex = InceptionFeatureExtractor(None, allow_random=True, batch_size=3,
                                   mesh=create_mesh(1))
    assert ex.net.mesh is None  # degenerates to the unsharded program
