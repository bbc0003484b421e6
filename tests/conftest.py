"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-chip
tests runnable on CPU via XLA host-platform device simulation).
"""

import os

# the session presets JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize registers the axon PJRT plugin in every interpreter; the
# env var alone does not stick, so force the platform via the config API
# before any backend initializes
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import subprocess

import numpy as np
import pytest

# build the native capture shim if missing (g++ is in the image)
_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "deepprior_tpu", "cpp")
_LIB = os.path.join(_CPP_DIR, "libcapture.so")
_SRC = os.path.join(_CPP_DIR, "capture.cpp")
if not os.path.exists(_LIB) or (
    os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
):
    # compile to a per-process temp name and os.replace (atomic on POSIX):
    # under pytest-xdist every worker runs this conftest concurrently, and
    # parallel g++ invocations writing the same -o would corrupt the .so
    _tmp = f"{_LIB}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-o", _tmp, os.path.join(_CPP_DIR, "capture.cpp"), "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_tmp, _LIB)
    except Exception:
        pass  # capture tests skip when the lib is absent
    finally:
        if os.path.exists(_tmp):
            try:
                os.remove(_tmp)
            except OSError:
                pass


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(23455)
