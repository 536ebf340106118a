"""Test configuration: force an 8-device virtual CPU platform before jax initializes.

This is the JAX idiom for testing multi-chip sharding logic without real hardware
(the driver separately dry-runs the multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# jax may already be imported at interpreter startup (axon sitecustomize); env vars are
# then too late, so force the platform through the live config object as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent XLA compilation cache: on a weak host the suite's wall-clock is
# dominated by re-compiling the same tiny test programs every run — warm runs
# skip straight to execution (first run populates ~tests/.jax_cache)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def rng():
    import numpy as np
    return np.random.RandomState(1234)
