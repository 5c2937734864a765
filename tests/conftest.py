import os
import pathlib

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multichip path). The environment's sitecustomize registers the axon TPU
# backend and forces JAX_PLATFORMS=axon at interpreter startup, so env vars
# alone are not enough — override through jax.config before any jax use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


@pytest.fixture(scope="session")
def corpus_dir():
    if not CORPUS.is_dir():
        pytest.skip("reference test corpus not available")
    return CORPUS


def corpus_file(name: str) -> bytes:
    return (CORPUS / name).read_bytes()
