"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise a real multi-device mesh without TPU hardware.

(ref test strategy: SURVEY.md §4 — the reference runs distributed tests on
real multi-GPU CI; the TPU-native analog is
``--xla_force_host_platform_device_count`` CPU meshes, with a separate
real-TPU kernel suite gated by markers.)
"""

import os

# Must be set before jax initializes its backends. The environment pre-sets
# JAX_PLATFORMS=axon (the TPU tunnel), so force-override unless the caller
# explicitly asked for the TPU suite with AO_TPU_TESTS=1.
if not os.environ.get("AO_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
if not os.environ.get("AO_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
