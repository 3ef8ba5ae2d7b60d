"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Force the CPU platform with 8 virtual devices. The environment may have
# already imported jax (TPU plugin registration via sitecustomize), so the
# env vars alone aren't enough — update jax.config after import too. The
# XLA flag still applies because the CPU client initializes lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
REF_EXAMPLE = "/root/reference/example"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")


def pytest_collection_modifyitems(config, items):
    if config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def golden_reads():
    return np.load(os.path.join(FIXTURES, "golden_reads.npz"), allow_pickle=True)


@pytest.fixture(scope="session")
def golden_pafs():
    with open(os.path.join(FIXTURES, "golden_pafs.json")) as f:
        return json.load(f)


@pytest.fixture(scope="session")
def example_index():
    """FM-index over the reference's bundled 10 kb example (fixture copy)."""
    from uncalled_tpu.index.fmindex import load_index

    local = os.path.join(FIXTURES, "example_index", "example_ref")
    if os.path.exists(local + ".utidx.npz"):
        return load_index(local)
    return load_index(os.path.join(REF_EXAMPLE, "index", "example_ref"))


@pytest.fixture(scope="session")
def example_threshes():
    from uncalled_tpu.mapping.oracle import load_uncl

    local = os.path.join(FIXTURES, "example_index", "example_ref.uncl")
    if os.path.exists(local):
        return load_uncl(local)
    return load_uncl(os.path.join(REF_EXAMPLE, "index", "example_ref.uncl"))


@pytest.fixture(scope="session")
def pore_model():
    from uncalled_tpu.poremodel import load_default

    return load_default()


class FakeRead:
    def __init__(self, id, signal):
        self.id = id
        self.signal = np.asarray(signal, dtype=np.float32)
        self.channel = 1
        self.number = 0
        self.start_sample = 0

    @property
    def raw_len(self):
        return len(self.signal)


@pytest.fixture
def make_read():
    return FakeRead
