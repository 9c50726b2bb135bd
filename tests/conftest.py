import os
import sys

import pytest

# TPU lane: `UHSDR_TPU_TESTS=1 python -m pytest tests/ -m tpu` keeps the
# real axon TPU backend and runs only the @pytest.mark.tpu tests (Mosaic
# kernel-engagement regressions fail a command instead of only the manual
# tools/tpu_conformance.py run).  Default: hermetic CPU backend with 8
# virtual devices for the sharding tests.
TPU_LANE = os.environ.get("UHSDR_TPU_TESTS") == "1"

if not TPU_LANE:
    # NOTE: this image's sitecustomize preloads jax and pins
    # JAX_PLATFORMS=axon (the real TPU tunnel), so plain env vars are not
    # enough — override the live jax config.  XLA_FLAGS must be set before
    # the CPU backend initializes (it is initialized lazily, so this is
    # early enough).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU backend "
                   "(UHSDR_TPU_TESTS=1, axon)")


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        skip = pytest.mark.skip(reason="TPU lane runs only -m tpu tests")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="TPU-only: run UHSDR_TPU_TESTS=1 pytest -m tpu on a "
                   "TPU host")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
