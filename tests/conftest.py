import os

# Tests always run on a virtual 8-device CPU mesh: the host environment pins
# JAX_PLATFORMS to the remote TPU ('axon'), which would make every tiny test
# case a slow tunnel round-trip and use MXU default matmul precision.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# sitecustomize may have imported jax before this file ran, in which case the
# env var above is too late — override through the config API as well.
jax.config.update("jax_platforms", "cpu")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run full-model-compile tests (adds ~35 min of CPU "
             "wall time; the fast default profile finishes in ~10 min — "
             "measured round 3 after slow-marking the 3-minute-class "
             "full-model tests: 135 passed / 36 skipped in 9:58)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-model compile tests, skipped by default "
                   "(enable with --runslow)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow (full-model compile) — use --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
