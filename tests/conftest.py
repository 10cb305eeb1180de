"""Test configuration: hermetic CPU backend with 8 virtual devices so
data/tensor-parallel sharding is exercised without TPU hardware."""

import os

# Force the CPU backend: the ambient environment points JAX at the
# 'axon' TPU tunnel, whose default matmul precision (bf16 on the MXU)
# breaks fp32 parity tests. Set VTP_TEST_TPU=1 to run on hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

if not os.environ.get("VTP_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # The container's sitecustomize registers the axon TPU plugin and
    # force-sets jax_platforms before conftest runs; override it here
    # (the backend is initialized lazily, so this is still in time).
    import jax

    jax.config.update("jax_platforms", "cpu")

from vtp_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def kernels():
    """Scoped kernel-dispatch configuration (vtp_tpu.ops.dispatch).

    The VTP_* dispatch env vars are read ONCE at import, so tests
    configure the dispatch directly: ``kernels(interpret=True)``.
    configure_kernels clears the jax compilation caches on any change —
    and again at teardown when restoring — so no trace compiled under an
    override can leak into another test (the round-4 stale-cache hazard,
    now eliminated by construction)."""
    import dataclasses

    from vtp_tpu.ops import dispatch

    old = dataclasses.asdict(dispatch.kernel_dispatch())
    yield dispatch.configure_kernels
    dispatch.configure_kernels(**old)
