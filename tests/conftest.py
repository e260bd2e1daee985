"""Test configuration.

Tests run on the CPU backend with a virtual 8-device mesh so multi-chip
sharding is exercised without TPU hardware (the standard JAX pattern;
SURVEY §4 item 4).  Must set flags before JAX initializes.
"""

import os

# NOTE: this environment pre-imports jax via sitecustomize with
# JAX_PLATFORMS=axon (TPU tunnel), so env vars alone are too late —
# jax.config.update is authoritative.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
DEJAVU_SERIF = "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"
DEJAVU_MONO = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"


@pytest.fixture(scope="session")
def dejavu():
    from fontrx.font.font import Font

    return Font.open(DEJAVU)


@pytest.fixture(scope="session")
def dejavu_serif():
    from fontrx.font.font import Font

    return Font.open(DEJAVU_SERIF)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
