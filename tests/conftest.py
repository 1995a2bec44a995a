"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
host-platform virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

# neutralize the axon TPU-tunnel sitecustomize (it force-registers the
# remote TPU backend and costs minutes of startup); tests are CPU-only.
# the env var alone is NOT enough — the sitecustomize overrides it via
# jax.config, so re-override through jax.config after import.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

# Persistent XLA:CPU compile cache: the long many-compile suite process
# occasionally segfaults INSIDE backend_compile (XLA:CPU flake, observed
# twice in full-suite runs at different tests, never in isolation and
# never on cached compiles).  With the cache populated, reruns read
# compiled programs from disk — stable and much faster.
#
# The cache dir is keyed by the host's CPU feature flags: the container
# migrates between physical hosts across rounds, and loading an AOT
# executable compiled for a DIFFERENT feature set SIGILLs inside
# compilation_cache.get_executable_and_time (round-5 diagnosis of the
# "suite segfault flake" — cpu_aot_loader logs the feature mismatch
# right before the crash).
import hashlib

_flags = ""
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _flags = _line
                break
except OSError:
    pass
_CPU_CACHE = (pathlib.Path(__file__).parent.parent
              / f".jax_cache_cpu-{hashlib.sha256(_flags.encode()).hexdigest()[:8]}")
jax.config.update("jax_compilation_cache_dir", str(_CPU_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import random
import zlib as pyzlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA_DIR


def _corpus() -> list[bytes]:
    rng = random.Random(1234)
    return [
        b"",
        b"a",
        b"Hello World!",
        b"aaaaaaaaaaaaaaaaaaaa",
        b"abcabcabcabcabcabc" * 40,
        bytes(rng.randrange(256) for _ in range(4096)),
        (b"The quick brown fox jumps over the lazy dog. " * 150),
        bytes(rng.randrange(4) for _ in range(10000)),     # low entropy
        b"\x00" * 5000,
    ]


@pytest.fixture(scope="session")
def corpus() -> list[bytes]:
    return _corpus()


@pytest.fixture(scope="session")
def zlib_oracle():
    """Python stdlib zlib as the byte-exactness interop oracle."""
    return pyzlib
