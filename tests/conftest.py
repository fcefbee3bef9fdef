import os
import shutil
import subprocess
from pathlib import Path

# Multi-device CPU mesh for sharding tests; must be set before jax import.
# FORCE cpu (not setdefault): the environment pre-sets JAX_PLATFORMS=axon,
# and the axon sitecustomize registers its PJRT plugin whenever
# PALLAS_AXON_POOL_IPS is set — which then blocks EVERY jax.devices()
# call on the remote tunnel (minutes-long compiles by other processes,
# or an unresponsive tunnel, hang the whole suite).  The test suite is
# CPU-mesh by design (SURVEY §4); chip parity is asserted in bench.py.
# Set MGT_TEST_DEVICE=1 to keep the axon backend available.
if not os.environ.get("MGT_TEST_DEVICE"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    # The axon sitecustomize may have imported jax at INTERPRETER
    # startup (before this conftest), registering the tunnel plugin
    # and pinning jax_platforms — env vars are too late then; override
    # the live config so no test touches the tunnel.
    import sys as _sys
    if "jax" in _sys.modules:
        _sys.modules["jax"].config.update("jax_platforms", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)
# Persistent compile cache: the device test files are dominated by XLA
# compilation on the CPU backend; a warm cache cuts re-runs dramatically.
_CACHE = Path(__file__).resolve().parents[1] / ".jax_cache"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_CACHE))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import pytest

REPO = Path(__file__).resolve().parents[1]
REF_DIR = Path("/root/reference")
REF_TEST = REF_DIR / "test"
ORACLE = REPO / ".golden" / "minigraph_ref"


def _ensure_oracle() -> bool:
    """Build the reference binary (test oracle only) if sources are present."""
    if ORACLE.exists():
        return True
    if not REF_DIR.exists() or shutil.which("gcc") is None:
        return False
    ORACLE.parent.mkdir(exist_ok=True)
    srcs = sorted(str(p) for p in REF_DIR.glob("*.c"))
    try:
        subprocess.run(
            ["gcc", "-O2", "-o", str(ORACLE), *srcs, "-lz", "-lpthread", "-lm"],
            check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError:
        return False


@pytest.fixture(scope="session")
def ref_test_dir():
    if not REF_TEST.exists():
        pytest.skip("reference test data not available")
    return REF_TEST


@pytest.fixture(scope="session")
def oracle():
    """Path to the compiled reference binary, used to generate golden outputs."""
    if not _ensure_oracle():
        pytest.skip("reference oracle binary not available")
    return ORACLE


@pytest.fixture(scope="session")
def run_oracle(oracle):
    def _run(*args, stdin_data=None):
        r = subprocess.run([str(oracle), *args], capture_output=True,
                           text=True, input=stdin_data)
        assert r.returncode == 0, r.stderr
        return r.stdout
    return _run
