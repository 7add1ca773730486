"""Two-process jax.distributed init through parallel.launch (VERDICT r3 #7).

Real multi-host behavior can't be faked in-process: jax.distributed must be
initialized BEFORE any backend query, so the test spawns two fresh python
processes on the CPU backend with a local coordinator and asserts both see
process_count == 2 with the right indices. This is exactly the call pattern
a real pod launch uses (same binary on every host, env-driven topology).
"""

import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
# initialize_distributed must run before any jax device/backend query
from minddet_tpu.parallel.launch import initialize_distributed, is_main_process
info = initialize_distributed()
assert info["process_count"] == 2, info
assert info["process_index"] == int(os.environ["JAX_PROCESS_ID"]), info
assert info["global_devices"] == 2, info
assert is_main_process() == (info["process_index"] == 0)
print("CHILD_OK", info["process_index"], flush=True)
"""


def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=repo))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # one CPU device per process so global_devices == 2
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"CHILD_OK {pid}" in out
