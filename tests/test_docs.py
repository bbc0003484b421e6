"""Docs-vs-code consistency: the migration guide and packaging metadata
must reference APIs that actually exist (reference README.md:1-45 is the
reference's only user doc; this framework ships docs/MIGRATION.md +
pyproject.toml, so they get the same don't-rot guarantee as code)."""

import importlib
import os
import re

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _resolve(dotted: str):
    """Import the longest module prefix of a dotted path, then getattr
    the rest.  Raises if any segment is missing."""
    parts = dotted.split(".")
    err = None
    for i in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:i]))
        except ImportError as e:
            err = e
            continue
        for attr in parts[i:]:
            obj = getattr(obj, attr)
        return obj
    raise ImportError(f"{dotted}: {err}")


def test_migration_guide_api_references_resolve():
    with open(os.path.join(ROOT, "docs", "MIGRATION.md")) as f:
        text = f.read()
    refs = sorted(set(re.findall(r"\bdeepprior_tpu(?:\.\w+)+", text)))
    assert len(refs) >= 12, f"guide unexpectedly sparse: {refs}"
    missing = []
    for ref in refs:
        try:
            _resolve(ref)
        except (ImportError, AttributeError) as e:
            missing.append(f"{ref} ({e})")
    assert not missing, "MIGRATION.md references missing APIs:\n" + "\n".join(
        missing
    )


def test_migration_guide_file_references_exist():
    with open(os.path.join(ROOT, "docs", "MIGRATION.md")) as f:
        text = f.read()
    # script/file paths mentioned as runnable commands must exist
    paths = set(re.findall(r"\b(?:mains|docs|deepprior_tpu)/[\w/.]+\.\w+", text))
    assert paths, "no file references found"
    missing = [p for p in sorted(paths) if not os.path.exists(os.path.join(ROOT, p))]
    assert not missing, f"MIGRATION.md references missing files: {missing}"


def test_pyproject_packages_exist():
    tomllib = pytest.importorskip("tomllib")
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "deepprior-tpu"
    for pkg in meta["tool"]["setuptools"]["packages"]:
        init = os.path.join(ROOT, pkg.replace(".", os.sep), "__init__.py")
        assert os.path.exists(init), f"packaged module missing: {pkg}"
    # the version here and in the package must agree
    import deepprior_tpu

    assert meta["project"]["version"] == deepprior_tpu.__version__
