"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware; bench.py runs on the real chip.
"""
import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# this image's sitecustomize force-registers the axon TPU platform and wins
# over the env var — override it in-process before any backend init
import jax

jax.config.update("jax_platforms", "cpu")

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def urls10k() -> bytes:
    return (DATA / "urls.10K").read_bytes()


@pytest.fixture(scope="session")
def urls10k_snappy() -> bytes:
    return (DATA / "urls.10K.snappy").read_bytes()


@pytest.fixture(scope="session")
def baddata3() -> bytes:
    return (DATA / "baddata3.snappy").read_bytes()


@pytest.fixture(scope="session")
def unaligned_bin() -> bytes:
    return (DATA / "unaligned_uint64_test.bin").read_bytes()


@pytest.fixture(scope="session")
def unaligned_snappy() -> bytes:
    return (DATA / "unaligned_uint64_test.snappy").read_bytes()
