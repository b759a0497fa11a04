"""Test config: run everything on a virtual 8-device CPU mesh.

The reference's tests require physical target hardware (SURVEY.md section
4.5); JAX lets us test op numerics AND multi-chip sharding deterministically
on CPU (`xla_force_host_platform_device_count`).  These env vars must be set
before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself in sitecustomize before conftest runs,
# so the env var alone does not stick — force the platform via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _build_native_lib():
    """Build native/libanakin_host.so once so the native tests run by
    default (reference analog: the C API is part of the default build,
    `framework/c_api/`).  Failure just leaves the tests skipped."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libanakin_host.so")
    src = os.path.join(root, "native", "anakin_host.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return
    try:
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass


_build_native_lib()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
