import os

# Force a deterministic 8-device CPU mesh for sharding tests; real-TPU runs
# use bench.py / the CLI instead of the test suite.
# FORCE (not setdefault): hosts that pre-set JAX_PLATFORMS to their TPU
# plugin (e.g. "axon") would otherwise win inside init_device(), which
# re-pins jax_platforms from this env var — flipping mid-suite to a
# 1-device TPU backend and breaking every 8-device mesh test.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS",
    (os.environ.get("XLA_FLAGS", "") +
     " --xla_force_host_platform_device_count=8").strip())

# The env var alone is NOT sufficient on hosts whose TPU plugin force-sets
# jax_platforms at registration time (observed: tests silently ran on the
# single tunneled TPU chip and every "8-device" mesh degraded to 1 device).
# Re-pin the config after import — this wins over the plugin because no
# backend has been initialized yet at conftest time.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REF_DIR = pathlib.Path("/root/reference/test_data")


@pytest.fixture(scope="session")
def hifi_bam() -> str:
    p = REF_DIR / "HG002_chr11_hifi_test.bam"
    if not p.exists():
        pytest.skip("HiFi test BAM unavailable")
    return str(p)


@pytest.fixture(scope="session")
def chr11_fa() -> str:
    p = REF_DIR / "chr11_2M.fa"
    if not p.exists():
        pytest.skip("chr11 test FASTA unavailable")
    return str(p)
