"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, per the project environment contract."""

import os

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config API is
# the reliable way to force the CPU backend with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_codes(rng, n, n_prob=0.02):
    """Random 5-letter codes with occasional Ns."""
    codes = rng.integers(0, 4, size=n).astype(np.uint8)
    nmask = rng.random(n) < n_prob
    codes[nmask] = 4
    return codes


def mutate(rng, codes, sub_p=0.08, ins_p=0.04, del_p=0.04):
    """Simple long-read-style mutation of a code sequence."""
    out = []
    for c in codes:
        r = rng.random()
        if r < del_p:
            continue
        if r < del_p + ins_p:
            out.append(rng.integers(0, 4))
        if rng.random() < sub_p:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
    return np.array(out, dtype=np.uint8)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
