"""Test configuration: run everything on a fake 8-device CPU backend.

The reference has no test suite at all (``tests/readme.md`` is the only file;
CI's pytest steps are commented out, ``.github/workflows/ci.yml:46-58``). Here
every module is unit-tested on CPU with a forced 8-device topology so the
multi-chip sharding paths are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu",
# overriding the JAX_PLATFORMS env var — override it back before backend init
# so tests always run on the fake 8-device CPU topology.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the heavyweight compiles (CenterPoint's 6-task
# head, the R-CNN ROI path) dominate suite wall time; repeat runs on the same
# host skip them entirely.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_comp_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

# JAX's atexit clean_up() (api.py: clear_backends -> util.clear_all_caches)
# takes 1-9+ MINUTES after heavy-compile sessions on this host (measured on
# test_records_roundtrip_to_centerpoint_loss: tests pass in ~50 s, then the
# interpreter sits in cache_clear for up to >545 s). Unregister exactly that
# handler — nothing else in teardown (multiprocessing joins, coverage
# flushes) is affected, and the process still exits through the normal path
# with pytest's status code.
import atexit  # noqa: E402

from jax._src import api as _jax_api  # noqa: E402

atexit.unregister(_jax_api.clean_up)
