"""Packaging contract: pyproject.toml entry points resolve to real callables.

The reference ships no packaging at all (three loose sub-project trees,
per-project requirements.txt); this framework is pip-installable with
console scripts for every CLI. These tests keep the declared surface from
drifting: every `[project.scripts]` target must import and be callable, and
every declared package-data glob must match committed files.
"""

import importlib
import tomllib
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def pyproject():
    with open(REPO_ROOT / "pyproject.toml", "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert scripts, "no console scripts declared"
    for name, target in scripts.items():
        mod_name, _, attr = target.partition(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_package_data_globs_match_files(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    for pkg, globs in data.items():
        pkg_dir = REPO_ROOT / pkg.replace(".", "/")
        for pattern in globs:
            assert list(pkg_dir.glob(pattern)), (
                f"package-data glob {pkg}/{pattern} matches nothing")


def test_all_subpackages_have_init():
    """setuptools find() only picks up dirs with __init__.py — a new
    subpackage without one would silently be dropped from installs."""
    pkg_root = REPO_ROOT / "gan_variant_research_tpu"
    for py in pkg_root.rglob("*.py"):
        d = py.parent
        while d != pkg_root.parent:
            init = d / "__init__.py"
            assert init.exists(), f"{d} lacks __init__.py (won't be installed)"
            d = d.parent


def test_version_consistency(pyproject):
    import gan_variant_research_tpu

    assert pyproject["project"]["version"] == gan_variant_research_tpu.__version__
