"""Eval suite tests: Fréchet math vs scipy ground truth + analytic
Gaussians, MiFID semantics, Inception architecture/converter, utils
contracts, and the full CLI pipeline against the golden report schema."""

import json
from pathlib import Path

import numpy as np
import pytest

from gan_variant_research_tpu.evalsuite.frechet import (
    frechet_distance,
    gaussian_stats,
    memorization_penalty,
    mifid_from_features,
)


class TestFrechet:
    def test_identical_distributions_zero(self, rng):
        mu = rng.standard_normal(16)
        a = rng.standard_normal((32, 16))
        sigma = np.cov(a, rowvar=False)
        assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)

    def test_mean_shift_analytic(self, rng):
        d = 8
        sigma = np.eye(d)
        mu1 = np.zeros(d)
        mu2 = np.full(d, 0.5)
        # FID = |mu1-mu2|^2 when covariances equal
        assert frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(
            d * 0.25, abs=1e-8
        )

    def test_scaled_identity_analytic(self):
        d = 8
        got = frechet_distance(np.zeros(d), 4.0 * np.eye(d), np.zeros(d), np.eye(d))
        # tr(aI + bI - 2 sqrt(ab) I) = d(a + b - 2√(ab)) = d(4+1-4) = d
        assert got == pytest.approx(d, abs=1e-8)

    def test_matches_scipy_sqrtm(self, rng):
        from scipy import linalg

        d = 24
        a = rng.standard_normal((100, d))
        b = rng.standard_normal((100, d)) * 1.5 + 0.3
        mu1, s1 = gaussian_stats(a)
        mu2, s2 = gaussian_stats(b)
        got = frechet_distance(mu1, s1, mu2, s2)
        covmean = linalg.sqrtm(s1 @ s2)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        want = float((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean))
        assert got == pytest.approx(want, rel=1e-6)


class TestMiFID:
    def test_memorized_fakes_get_penalized(self, rng):
        real = rng.standard_normal((64, 32))
        fresh = rng.standard_normal((64, 32))
        copied = real + 1e-4 * rng.standard_normal((64, 32))  # near-duplicates
        m_fresh = memorization_penalty(fresh, real, cosine_eps=0.1)
        m_copied = memorization_penalty(copied, real, cosine_eps=0.1)
        assert m_fresh == 1.0      # above eps → no penalty
        assert m_copied < 0.01     # heavy memorization
        r_fresh = mifid_from_features(real, fresh)
        r_copied = mifid_from_features(real, copied)
        # same-ish FID scale, but MiFID explodes for the memorizer
        assert r_copied["mifid"] > 100 * r_copied["fid"]
        assert r_fresh["mifid"] == pytest.approx(r_fresh["fid"], rel=1e-6)

    def test_abs_cosine_used(self, rng):
        real = rng.standard_normal((16, 8))
        anti = -real  # cosine −1 → abs-distance 0 (torchmetrics semantics)
        assert memorization_penalty(anti, real) < 1e-6

    def test_single_sample_fails_loudly(self, rng):
        """np.cov of one row is a 0-d scalar; without the guard the Fréchet
        matmuls die with an opaque gufunc error (observed driving the eval
        CLI with one real image). torchmetrics imposes the same minimum."""
        one = rng.standard_normal((1, 32))
        many = rng.standard_normal((8, 32))
        with pytest.raises(ValueError, match="at least 2"):
            mifid_from_features(one, many)
        with pytest.raises(ValueError, match="at least 2"):
            mifid_from_features(many, one)

    def test_self_comparison_never_goes_negative(self, rng):
        """FID and the memorization distance are mathematically ≥ 0, but on
        IDENTICAL feature sets both cancel to float noise of either sign —
        and a noise-negative FID divided by the tiny penalty flipped MiFID
        from maximally-penalized to absurdly good (observed −1.8e8 on a
        self-comparison eval run). Pin the clamps."""
        feats = rng.standard_normal((64, 32)).astype(np.float32)
        r = mifid_from_features(feats, feats.copy())
        assert 0.0 <= r["fid"] < 1e-6  # noise floors at zero, never below
        assert r["memorization_distance"] >= 0.0
        assert r["mifid"] >= 0.0
        # float32 noise can push |cos| past 1 on duplicated rows; the
        # penalty itself must clamp, not just happen to land positive
        assert memorization_penalty(feats, feats.copy()) >= 0.0


class TestInception:
    @pytest.fixture(scope="class")
    def net(self):
        from gan_variant_research_tpu.evalsuite.inception import InceptionFID

        return InceptionFID(None, allow_random=True)

    def test_output_is_2048d(self, net, rng):
        u8 = rng.integers(0, 256, (2, 299, 299, 3), dtype=np.uint8)
        feats = net.features_u8(u8)
        assert feats.shape == (2, 2048)
        assert np.isfinite(feats).all()

    def test_requires_weights_unless_allowed(self):
        from gan_variant_research_tpu.evalsuite.inception import InceptionFID

        with pytest.raises(ValueError, match="canonical FID weights"):
            InceptionFID(None)

    def test_validate_rejects_missing_leaf(self, net):
        """The converter's gate (scripts/convert_inception.py): a truncated
        checkpoint — a whole leaf gone — must fail validation."""
        import copy

        import jax

        broken = copy.copy(net)
        broken.params = jax.tree.map(lambda x: x, net.params)  # deep-ish copy
        block = next(iter(broken.params))
        leaf = next(iter(broken.params[block]))
        del broken.params[block][leaf]
        with pytest.raises(ValueError, match="do not match the architecture"):
            broken._validate_params()

    def test_validate_rejects_wrong_leaf_shape(self, net):
        """A foreign/corrupt checkpoint with right paths but wrong tensor
        shapes must fail validation, not silently mis-anchor FID."""
        import copy

        import jax

        def first_leaf_path(tree, prefix=()):
            for k, v in tree.items():
                if isinstance(v, dict):
                    return first_leaf_path(v, prefix + (k,))
                return prefix + (k,)

        broken = copy.copy(net)
        broken.params = jax.tree.map(np.asarray, net.params)
        path = first_leaf_path(broken.params)
        node = broken.params
        for k in path[:-1]:
            node = node[k]
        node[path[-1]] = node[path[-1]][..., :1]  # truncate last axis
        with pytest.raises(ValueError, match="wrong leaf shapes"):
            broken._validate_params()

    def test_torch_state_dict_conversion_roundtrip(self, net, tmp_path):
        """Build a torch-style state dict from the param tree (the naming
        bijection), convert it, and check the tree matches exactly."""
        import torch

        from gan_variant_research_tpu.evalsuite.inception import (
            _convert_torch_state_dict,
            load_torch_inception_weights,
            save_converted_weights,
        )

        sd = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + [k])
                else:
                    prefix = ".".join(path)
                    arr = np.asarray(v)
                    if k == "conv_kernel":
                        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                            arr.transpose(3, 2, 0, 1).copy()
                        )
                    else:
                        leaf = {"bn_scale": "weight", "bn_bias": "bias",
                                "bn_mean": "running_mean", "bn_var": "running_var"}[k]
                        sd[f"{prefix}.bn.{leaf}"] = torch.from_numpy(arr.copy())

        walk(net.params, [])
        sd["fc.weight"] = torch.zeros(1008, 2048)  # classifier head is skipped

        converted = _convert_torch_state_dict(sd)

        def compare(a, b, path=""):
            assert set(a) == set(b), (path, set(a) ^ set(b))
            for k in a:
                if isinstance(a[k], dict):
                    compare(a[k], b[k], path + "/" + k)
                else:
                    np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

        compare(net.params, converted)

        # npz round trip
        save_converted_weights(converted, tmp_path / "w.npz")
        reloaded = load_torch_inception_weights(tmp_path / "w.npz")
        compare(converted, reloaded)

    def test_pth_load_path(self, net, tmp_path):
        import torch

        from gan_variant_research_tpu.evalsuite.inception import InceptionFID

        sd = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + [k])
                else:
                    prefix = ".".join(path)
                    arr = np.asarray(v)
                    if k == "conv_kernel":
                        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
                            arr.transpose(3, 2, 0, 1).copy())
                    else:
                        leaf = {"bn_scale": "weight", "bn_bias": "bias",
                                "bn_mean": "running_mean", "bn_var": "running_var"}[k]
                        sd[f"{prefix}.bn.{leaf}"] = torch.from_numpy(arr.copy())

        walk(net.params, [])
        torch.save(sd, tmp_path / "pt_inception.pth")
        net2 = InceptionFID(tmp_path / "pt_inception.pth")
        assert not net2.randomly_initialized


class TestUtils:
    def test_hash_stability_and_sensitivity(self, tmp_path):
        from gan_variant_research_tpu.evalsuite.utils import compute_image_list_hash

        a = tmp_path / "a.jpg"
        b = tmp_path / "b.jpg"
        a.write_bytes(b"xx")
        b.write_bytes(b"yyy")
        h1 = compute_image_list_hash([a, b], tmp_path)
        h2 = compute_image_list_hash([b, a], tmp_path)  # order-insensitive
        assert h1 == h2
        a.write_bytes(b"xxxx")  # size change → different hash
        assert compute_image_list_hash([a, b], tmp_path) != h1

    def test_validation_warnings(self, tmp_path):
        from gan_variant_research_tpu.evalsuite.utils import validate_image_counts

        fakes = []
        reals = []
        for i in range(3):
            p = tmp_path / f"f{i}.jpg"
            p.write_bytes(b"x")
            fakes.append(p)
            q = tmp_path / f"r{i}.png"
            q.write_bytes(b"y")
            reals.append(q)
        v = validate_image_counts(fakes, reals)
        assert v["num_fake"] == 3 and v["num_real"] == 3
        assert any("below expected range" in w for w in v["warnings"])
        assert any("below expected minimum" in w for w in v["warnings"])
        with pytest.raises(ValueError):
            validate_image_counts([], reals)

    def test_overlap_check(self, tmp_path):
        from gan_variant_research_tpu.evalsuite.utils import check_dataset_overlap

        o = check_dataset_overlap([Path("x/1.jpg")], [Path("y/1.jpg")])
        assert o["has_overlap"] and o["overlap_count"] == 1


def _make_image_folder(folder: Path, n: int, seed: int, size=32):
    from PIL import Image

    rng = np.random.default_rng(seed)
    folder.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        img = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        p = folder / f"{i:03d}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


class TestPipeline:
    def test_full_cli_pipeline_schema(self, tmp_path, monkeypatch):
        """End-to-end run with random Inception weights on synthetic folders;
        validates the report against the golden sample_report.json schema."""
        from gan_variant_research_tpu.evalsuite.cli import run_evaluation

        _make_image_folder(tmp_path / "fake", 10, 0)
        _make_image_folder(tmp_path / "real", 6, 1)
        cfg = {
            "name": "pipeline_test",
            "fake_dir": str(tmp_path / "fake"),
            "real_dir": str(tmp_path / "real"),
            "real_mode": "folder",
            "out_dir": str(tmp_path / "reports"),
            "cache_dir": str(tmp_path / "cache"),
            "batch_size": 4,
            "num_workers": 2,
            "img_size": 96,  # smallest fast-on-CPU size ≥ Inception's 75 min
            "cosine_eps": 0.1,
            "use_cache": True,
            "inception_weights": None,
        }
        report = run_evaluation(cfg, allow_random_weights=True)

        # golden schema (EVAL/cache/reports/sample_report.json)
        assert set(report) >= {"run", "scores", "hashes", "notes",
                               "memorization_analysis"}
        run = report["run"]
        for key in ["name", "timestamp_utc", "fake_dir", "real_mode",
                    "real_dir_or_tfds", "num_fake", "num_real", "img_size",
                    "batch_size", "num_workers", "warnings"]:
            assert key in run, key
        scores = report["scores"]
        assert set(scores) == {"mifid", "fid", "cosine_min_distance"}
        cos = scores["cosine_min_distance"]
        for key in ["median", "mean", "std", "p10", "p90",
                    "hist_bins", "hist_counts"]:
            assert key in cos, key
        assert len(cos["hist_bins"]) == 11 and len(cos["hist_counts"]) == 10
        for key in ["fake_list_sha1", "real_list_sha1", "real_cache_key"]:
            assert key in report["hashes"]
        worst = report["memorization_analysis"]["worst_cases"]
        assert len(worst) == 10  # top-16 capped by n_fake
        assert set(worst[0]) == {"fake_path", "distance",
                                 "nearest_real_path", "cosine_similarity"}
        assert np.isfinite(scores["fid"])

        # artifacts on disk: JSON report + text summary + CSV
        assert list((tmp_path / "reports").glob("*_report.json"))
        assert list((tmp_path / "reports").glob("*_worst_cases.csv"))
        assert list((tmp_path / "cache" / "logs").glob("*.txt"))
        # the real-stats cache was written and is keyed by the dataset hash
        assert list((tmp_path / "cache" / "real_stats").glob("*.npz"))

        # second run hits the cache (and changes nothing)
        report2 = run_evaluation(cfg, allow_random_weights=True)
        assert report2["scores"]["fid"] == report["scores"]["fid"]


class TestTFRecordEvalInputs:
    """Native TFRecord input for the eval suite (beyond-reference: the
    reference CLI rejects its non-folder mode, EVAL/eval/cli.py:134-136;
    here the Kaggle shards evaluate without an unpack step)."""

    def test_entry_pathlike_surface(self, tmp_path):
        from gan_variant_research_tpu.cli.tfrec_tool import pack
        from gan_variant_research_tpu.evalsuite.datasets import (
            TFRecordEntry,
            enumerate_eval_inputs,
            is_tfrecord_input,
            load_eval_image,
        )
        from gan_variant_research_tpu.evalsuite.utils import (
            check_dataset_overlap,
            compute_image_list_hash,
            validate_image_counts,
        )

        paths = _make_image_folder(tmp_path / "imgs", 3, 7)
        pack(tmp_path / "imgs", tmp_path / "shards", shard_size=2)
        assert is_tfrecord_input(tmp_path / "shards")
        assert not is_tfrecord_input(tmp_path / "imgs")

        entries = enumerate_eval_inputs(tmp_path / "shards", img_size=32)
        assert len(entries) == 3 and all(
            isinstance(e, TFRecordEntry) for e in entries)
        # names carry the packed image_name feature
        assert sorted(e.name for e in entries) == [p.name for p in paths]
        # sizes are record payload lengths (≥ the embedded JPEG bytes)
        for e in entries:
            assert e.stat().st_size > 0

        # pixel-identical to reading the original files (bitwise embedding)
        by_name = {e.name: e for e in entries}
        for p in paths:
            np.testing.assert_array_equal(
                load_eval_image(by_name[p.name], 32), load_eval_image(p, 32))

        # the reference's utils contracts work unchanged on entries
        v = validate_image_counts(entries, entries)
        assert v["num_fake"] == 3
        overlap = check_dataset_overlap(entries, paths)
        assert overlap["overlap_count"] == 3  # same names by construction

        # SHA1 keys on record identity: stable across enumerations,
        # sensitive to content changes
        h1 = compute_image_list_hash(entries, tmp_path / "shards")
        h2 = compute_image_list_hash(
            enumerate_eval_inputs(tmp_path / "shards", img_size=32),
            tmp_path / "shards")
        assert h1 == h2
        _make_image_folder(tmp_path / "imgs2", 3, 8)
        pack(tmp_path / "imgs2", tmp_path / "shards2", shard_size=2)
        h3 = compute_image_list_hash(
            enumerate_eval_inputs(tmp_path / "shards2", img_size=32),
            tmp_path / "shards2")
        assert h3 != h1

    def test_eval_from_shards_matches_folder(self, tmp_path):
        """Scores from shard inputs equal the unpacked-folder scores exactly
        (the embedded bytes ARE the original JPEGs)."""
        from gan_variant_research_tpu.cli.tfrec_tool import pack
        from gan_variant_research_tpu.evalsuite.cli import run_evaluation

        _make_image_folder(tmp_path / "fake", 10, 0)
        _make_image_folder(tmp_path / "real", 6, 1)
        pack(tmp_path / "real", tmp_path / "real_tfrec", shard_size=4)
        base = {
            "fake_dir": str(tmp_path / "fake"),
            "real_mode": "folder",
            "out_dir": str(tmp_path / "reports"),
            "cache_dir": str(tmp_path / "cache"),
            "batch_size": 4,
            "num_workers": 2,
            "img_size": 96,
            "cosine_eps": 0.1,
            "use_cache": False,
            "inception_weights": None,
        }
        rep_folder = run_evaluation(
            dict(base, name="folder", real_dir=str(tmp_path / "real")),
            allow_random_weights=True)
        rep_shards = run_evaluation(
            dict(base, name="shards", real_dir=str(tmp_path / "real_tfrec")),
            allow_random_weights=True)
        assert rep_shards["run"]["num_real"] == 6
        assert rep_shards["scores"]["fid"] == rep_folder["scores"]["fid"]
        assert rep_shards["scores"]["mifid"] == rep_folder["scores"]["mifid"]


def test_prefetch_propagates_producer_errors():
    """A decode/transfer error in the background staging thread must surface
    in the consumer, not silently truncate the feature set."""
    from gan_variant_research_tpu.evalsuite.features import _prefetch_to_device

    def bad_batches():
        yield (np.zeros((2, 4, 4, 3), np.uint8), 2)
        raise OSError("corrupt image")

    it = _prefetch_to_device(bad_batches())
    next(it)
    with pytest.raises(OSError, match="corrupt image"):
        next(it)


def test_prefetch_producer_exits_when_generator_abandoned():
    """If the consumer abandons the generator (e.g. the caller raises
    mid-extraction), the staging thread must exit instead of parking on
    q.put forever holding decoded batches."""
    import threading
    import time

    from gan_variant_research_tpu.evalsuite.features import _prefetch_to_device

    def endless_batches():
        while True:
            yield (np.zeros((2, 4, 4, 3), np.uint8), 2)

    it = _prefetch_to_device(endless_batches(), depth=1)
    next(it)  # producer is now running and will park on the full queue
    assert any(t.name == "eval-prefetch" and t.is_alive()
               for t in threading.enumerate())
    it.close()  # abandon: runs the generator's finally (stop + drain)
    deadline = time.time() + 10
    while time.time() < deadline:
        if not any(t.name == "eval-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            return
        time.sleep(0.05)
    raise AssertionError("eval-prefetch thread still alive after abandon")


class TestKID:
    def test_mmd2_unbiased_hand_computed(self):
        from gan_variant_research_tpu.evalsuite.kid import (
            _mmd2_unbiased,
            _polynomial_kernel,
        )

        x = np.array([[1.0, 0.0], [0.0, 1.0]])
        y = np.array([[1.0, 1.0], [2.0, 0.0]])
        # gamma = 1/d = 0.5, coef 1, degree 3
        k_xx = _polynomial_kernel(x, x)
        k_yy = _polynomial_kernel(y, y)
        k_xy = _polynomial_kernel(x, y)
        got = _mmd2_unbiased(k_xx, k_yy, k_xy)
        # off-diagonal k_xx: (0.5*0+1)^3 = 1 (both); k_yy off-diag:
        # (0.5*2+1)^3 = 8; k_xy entries: xy^T = [[1,2],[1,0]] ->
        # ((0.5*.+1)^3) = [[3.375, 8], [3.375, 1]]
        want = 1.0 + 8.0 - 2 * np.mean([3.375, 8.0, 3.375, 1.0])
        assert got == pytest.approx(want, rel=1e-12)

    def test_kid_null_vs_shifted(self, rng):
        from gan_variant_research_tpu.evalsuite.kid import compute_kid

        a = rng.standard_normal((400, 32))
        b = rng.standard_normal((400, 32))
        null = compute_kid(a, b, subsets=20, subset_size=100)
        shifted = compute_kid(a, b + 1.0, subsets=20, subset_size=100)
        assert abs(null["kid_mean"]) < 0.05          # same distribution ≈ 0
        assert shifted["kid_mean"] > 10 * abs(null["kid_mean"])
        assert null["subset_size"] == 100 and null["subsets"] == 20

    def test_kid_in_cli_report(self, tmp_path, rng):
        """--kid adds a scores.kid block; without it the schema is unchanged."""
        from gan_variant_research_tpu.evalsuite.report import create_report

        base = {"mifid": 1.0, "fid": 2.0, "cosine_min_distance": {}}
        r0 = create_report(base, {}, {}, {})
        assert "kid" not in r0["scores"]
        r1 = create_report({**base, "kid": {"kid_mean": 0.01, "kid_std": 0.002,
                                            "subsets": 100, "subset_size": 50}},
                           {}, {}, {})
        assert r1["scores"]["kid"]["kid_mean"] == 0.01


class TestPrecisionRecall:
    def test_identical_sets_perfect(self, rng):
        from gan_variant_research_tpu.evalsuite.prd import compute_precision_recall

        x = rng.standard_normal((64, 16))
        out = compute_precision_recall(x, x.copy())
        assert out["precision"] == 1.0 and out["recall"] == 1.0

    def test_disjoint_clusters_zero(self, rng):
        from gan_variant_research_tpu.evalsuite.prd import compute_precision_recall

        a = rng.standard_normal((64, 16))
        b = rng.standard_normal((64, 16)) + 1000.0
        out = compute_precision_recall(a, b)
        assert out["precision"] == 0.0 and out["recall"] == 0.0

    def test_mode_drop_hits_recall_not_precision(self, rng):
        """Fake covering only one of two real modes: precision stays high
        (every fake is on a real mode), recall drops toward ~0.5."""
        from gan_variant_research_tpu.evalsuite.prd import compute_precision_recall

        mode_a = rng.standard_normal((100, 8))
        mode_b = rng.standard_normal((100, 8)) + 50.0
        real = np.concatenate([mode_a, mode_b])
        fake = rng.standard_normal((100, 8)) * 1.0  # only mode A
        out = compute_precision_recall(real, fake)
        assert out["precision"] >= 0.75
        assert out["recall"] < 0.7
        assert out["precision"] > out["recall"] + 0.2

    def test_too_few_samples_raises(self, rng):
        from gan_variant_research_tpu.evalsuite.prd import compute_precision_recall

        with pytest.raises(ValueError):
            compute_precision_recall(rng.standard_normal((3, 4)),
                                     rng.standard_normal((10, 4)), k=3)


class TestRealStatsCacheKeying:
    """The real-stats cache must key on the extractor identity, not the
    dataset alone — stats from random weights / another resolution live in
    a different feature space and reusing them corrupts every later FID."""

    def test_cache_path_varies_with_extractor_tag(self, tmp_path):
        from gan_variant_research_tpu.evalsuite.features import cache_path_for

        base = cache_path_for(tmp_path, "abc123")
        rnd = cache_path_for(tmp_path, "abc123", "random:299")
        big = cache_path_for(tmp_path, "abc123", "random:512")
        wts = cache_path_for(tmp_path, "abc123", "weights.npz:1234:299")
        assert len({base, rnd, big, wts}) == 4
        # same (dataset, extractor) stays stable across calls
        assert rnd == cache_path_for(tmp_path, "abc123", "random:299")

    def test_extractor_identity_tag(self, tmp_path):
        from gan_variant_research_tpu.evalsuite.features import (
            InceptionFeatureExtractor,
        )

        a = InceptionFeatureExtractor(allow_random=True, img_size=299)
        b = InceptionFeatureExtractor(allow_random=True, img_size=75)
        assert a.identity_tag != b.identity_tag

    def test_corrupt_cache_recovers(self, tmp_path, capsys):
        import numpy as np

        from gan_variant_research_tpu.evalsuite.features import (
            load_cached_stats,
            save_cached_stats,
        )

        p = tmp_path / "real_stats" / "k.npz"
        save_cached_stats(p, np.zeros(4), np.eye(4), np.zeros((2, 4)), 2)
        got = load_cached_stats(p)
        assert got is not None and got["n"] == 2
        assert not list(p.parent.glob("*.tmp.npz"))  # atomic write cleaned up
        p.write_bytes(b"truncated garbage")  # simulated crash mid-write
        assert load_cached_stats(p) is None  # recompute, don't wedge
        assert "unreadable stats cache" in capsys.readouterr().out
