"""Unit tests for the multi-host input-sharding machinery that don't need
subprocesses (the real 2-process run is test_multiprocess_dp.py): global
index determinism, per-process bounds, and the resume fast-forward."""

import numpy as np
import pytest
from PIL import Image

from gan_variant_research_tpu.data.loader import UnpairedLoader
from gan_variant_research_tpu.parallel import create_mesh, process_batch_bounds


@pytest.fixture(scope="module")
def folders(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls")
    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        (root / d).mkdir()
        for i in range(10):
            Image.fromarray(
                rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            ).save(root / d / f"{i}.png")
    return root


def test_global_index_order_is_seed_deterministic(folders):
    """Two loaders with the same seed draw the identical global index
    sequence — the property every process of a multi-host run relies on to
    agree on the global batch without communication."""
    l1 = UnpairedLoader(folders / "a", folders / "b", batch_size=4, size=16,
                        seed=7, num_workers=1, prefetch=1)
    l2 = UnpairedLoader(folders / "a", folders / "b", batch_size=4, size=16,
                        seed=7, num_workers=1, prefetch=1)
    try:
        for _ in range(5):
            p1, m1 = next(l1)
            p2, m2 = next(l2)
            np.testing.assert_array_equal(p1, p2)
            np.testing.assert_array_equal(m1, m2)
    finally:
        l1.close()
        l2.close()


def test_start_step_fast_forwards_the_stream(folders):
    """A loader built with start_step=k yields exactly the batches a fresh
    loader yields after k steps — the deterministic-resume contract."""
    full = UnpairedLoader(folders / "a", folders / "b", batch_size=4, size=16,
                          seed=3, num_workers=1, prefetch=1)
    try:
        for _ in range(3):
            skipped_to = next(full)
        resumed = UnpairedLoader(folders / "a", folders / "b", batch_size=4,
                                 size=16, seed=3, num_workers=1, prefetch=1,
                                 start_step=2)
        try:
            got = next(resumed)
            np.testing.assert_array_equal(got[0], skipped_to[0])
            np.testing.assert_array_equal(got[1], skipped_to[1])
        finally:
            resumed.close()
    finally:
        full.close()


def test_process_batch_bounds_single_process_is_full_batch():
    ctx = create_mesh()
    assert process_batch_bounds(ctx, 16) == (0, 16)
    assert process_batch_bounds(ctx, 8) == (0, 8)


def test_strict_slice_requires_device_sharding(folders):
    with pytest.raises(ValueError, match="device_sharding"):
        UnpairedLoader(folders / "a", folders / "b", batch_size=4, size=16,
                       process_bounds=(0, 2))


def test_bad_bounds_rejected(folders):
    with pytest.raises(ValueError, match="process_bounds"):
        UnpairedLoader(folders / "a", folders / "b", batch_size=4, size=16,
                       process_bounds=(2, 10))


def test_batch_larger_than_dataset_fails_loudly(folders):
    """10-image domains can't fill a 12-batch under drop_last; without the
    guard the epoch slice silently comes up short and the fixed-shape jit
    step fails far from the cause."""
    with pytest.raises(ValueError, match="batch_size"):
        UnpairedLoader(folders / "a", folders / "b", batch_size=12, size=16)
