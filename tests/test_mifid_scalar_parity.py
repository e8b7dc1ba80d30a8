"""Cross-framework parity at the SCALAR level: the full JAX pipeline
(`run_evaluation`) must reproduce FID and MiFID computed by an INDEPENDENT
torch + scipy oracle over the same images and the same (vendored-mirror)
Inception weights, to ≤0.1% (VERDICT r2 next #2).

This puts frechet.py's eigh-based sqrtm, the np.cov conventions, and the
|cos| memorization penalty under a foreign implementation — the half of
SURVEY §7 hard-part #1 that does NOT need the canonical weights file. The
oracle intentionally uses the classic pytorch-fid formulation
(scipy.linalg.sqrtm of Σ₁Σ₂) rather than this repo's two-eigh identity, so
agreement is evidence, not tautology. Ref: EVAL/eval/mifid.py:16-106.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
scipy_linalg = pytest.importorskip("scipy.linalg")

from PIL import Image  # noqa: E402

from tests.torch_inception_ref import TorchInceptionV3FID, randomize_  # noqa: E402

SIZE = 96  # fully convolutional net: 96² exercises the same ops as 299²


def _write_images(folder, n, seed):
    folder.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        # PNG: lossless, so both frameworks decode identical pixels; already
        # at SIZE² so no resampling happens in either pipeline
        p = folder / f"{i}.png"
        Image.fromarray(rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    return paths


def _torch_features(model, paths):
    imgs = []
    for p in sorted(paths):
        with Image.open(p) as im:
            imgs.append(np.asarray(im.convert("RGB"), dtype=np.uint8))
    x = torch.from_numpy(np.stack(imgs)).permute(0, 3, 1, 2).float()
    x = (x - 128.0) / 128.0
    with torch.no_grad():
        return model(x).numpy().astype(np.float64)


def _oracle_fid(feats_f, feats_r):
    """Classic pytorch-fid formula: scipy.linalg.sqrtm of Σ₁Σ₂."""
    mu1, s1 = feats_f.mean(0), np.cov(feats_f, rowvar=False)
    mu2, s2 = feats_r.mean(0), np.cov(feats_r, rowvar=False)
    covmean = scipy_linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    diff = mu1 - mu2
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean))


def _oracle_memorization(feats_f, feats_r, eps):
    """torchmetrics MiFID memorization distance, implemented from its
    definition: mean over fakes of min (1 − |cos|), thresholded at eps."""
    f = feats_f / np.linalg.norm(feats_f, axis=1, keepdims=True)
    r = feats_r / np.linalg.norm(feats_r, axis=1, keepdims=True)
    d = float((1.0 - np.abs(f @ r.T)).min(axis=1).mean())
    return d if d < eps else 1.0


@pytest.mark.slow
def test_fid_and_mifid_scalars_match_torch_oracle(tmp_path):
    fake_paths = _write_images(tmp_path / "fake", 20, seed=0)
    real_paths = _write_images(tmp_path / "real", 12, seed=1)

    model = randomize_(TorchInceptionV3FID(), seed=0)
    pt = tmp_path / "mirror_weights.pth"
    torch.save(model.state_dict(), pt)

    # cosine_eps=2.0 keeps the memorization penalty ACTIVE (d < eps), so
    # MiFID = FID / d tests the penalty math, not the m=1 passthrough
    from gan_variant_research_tpu.evalsuite.cli import run_evaluation

    cfg = {
        "name": "scalar_parity",
        "fake_dir": str(tmp_path / "fake"),
        "real_dir": str(tmp_path / "real"),
        "real_mode": "folder",
        "out_dir": str(tmp_path / "reports"),
        "cache_dir": str(tmp_path / "cache"),
        "batch_size": 8,
        "num_workers": 2,
        "img_size": SIZE,
        "cosine_eps": 2.0,
        "use_cache": False,
        "inception_weights": str(pt),
    }
    report = run_evaluation(cfg)
    scores = report["scores"]

    feats_f = _torch_features(model, fake_paths)
    feats_r = _torch_features(model, real_paths)
    fid_oracle = _oracle_fid(feats_f, feats_r)
    m_oracle = _oracle_memorization(feats_f, feats_r, eps=2.0)
    mifid_oracle = fid_oracle / (m_oracle + 1e-15)
    assert m_oracle < 2.0, "penalty branch must be active for this test"

    assert scores["fid"] == pytest.approx(fid_oracle, rel=1e-3)
    assert scores["mifid"] == pytest.approx(mifid_oracle, rel=1e-3)


def test_passthrough_branch_matches_oracle(tmp_path):
    """With an eps below the observed min-distance mean, d ≥ eps → m = 1 →
    MiFID == FID on both sides (the reference-default branch for
    non-memorizing models). Random-weight pool3 features are sparse and
    highly aligned (d ≈ 1e-3), so a tiny eps forces the passthrough."""
    _write_images(tmp_path / "fake", 6, seed=2)
    _write_images(tmp_path / "real", 5, seed=3)

    model = randomize_(TorchInceptionV3FID(), seed=0)
    pt = tmp_path / "w.pth"
    torch.save(model.state_dict(), pt)

    from gan_variant_research_tpu.evalsuite.cli import run_evaluation

    cfg = {
        "name": "passthrough",
        "fake_dir": str(tmp_path / "fake"),
        "real_dir": str(tmp_path / "real"),
        "real_mode": "folder",
        "out_dir": str(tmp_path / "reports"),
        "cache_dir": str(tmp_path / "cache"),
        "batch_size": 8,
        "num_workers": 2,
        "img_size": SIZE,
        "cosine_eps": 1e-5,
        "use_cache": False,
        "inception_weights": str(pt),
    }
    report = run_evaluation(cfg)
    scores = report["scores"]
    # the oracle agrees the penalty is inactive for unrelated random images
    model2 = randomize_(TorchInceptionV3FID(), seed=0)
    model2.load_state_dict(model.state_dict())
    feats_f = _torch_features(model2, list((tmp_path / "fake").iterdir()))
    feats_r = _torch_features(model2, list((tmp_path / "real").iterdir()))
    assert _oracle_memorization(feats_f, feats_r, eps=1e-5) == 1.0
    # m = 1 → MiFID == FID (report schema rounds both to 4 decimals)
    assert scores["mifid"] == pytest.approx(scores["fid"], rel=1e-9)
    assert scores["fid"] == pytest.approx(_oracle_fid(feats_f, feats_r), rel=1e-3)
