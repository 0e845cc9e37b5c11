"""Test configuration.

Device-kernel tests run on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware (the driver separately dry-run-compiles the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Must be set before jax initializes its backends.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compile cache: kernel tests are compile-bound on this
# single-core host; caching makes re-runs ~instant.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/amatsukaze_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# A site-installed accelerator plugin may force its own platform via
# jax.config at interpreter start (overriding the env var); force CPU back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import faulthandler  # noqa: E402

import pytest  # noqa: E402

# Hard per-test watchdog (VERDICT r4 item 2): round 4's full-suite run
# wedged inside an XLA helper thread (kernel-level spin, SIGKILL-immune)
# and poisoned the bench host for the rest of the round.  faulthandler's
# watchdog runs in a dedicated C thread that does not depend on the GIL
# or on any Python thread making progress: if ONE test exceeds the cap it
# dumps every thread's traceback to stderr and hard-exits the process,
# so a wedge costs at most TEST_HARD_TIMEOUT seconds instead of the
# whole round.
_TEST_HARD_TIMEOUT = float(os.environ.get("AMATSUKAZE_TEST_TIMEOUT", "600"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    faulthandler.dump_traceback_later(_TEST_HARD_TIMEOUT, exit=True)
    yield
    faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def ctx():
    from amatsukaze_tpu.utils import AMTContext

    return AMTContext(level="error")
