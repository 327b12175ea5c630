"""Multi-host (multi-controller SPMD) integration test on a 2-process CPU
cluster: each process feeds its host-local batch rows through
``put_host_local_batch`` and the global reduction must see every row exactly
once. This is the TPU-native analog of the reference's
DistributedSamplerWrapper + DDP data path (reference:
datamodule/data_module.py:84-106, train.py:319), which this repo's round-1
``device_put`` feeding got wrong for ``process_count() > 1``.

Runs real ``jax.distributed`` with a localhost coordinator; each process has
2 virtual CPU devices (4 global).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from mocov2_whisper_flamingo_tpu.parallel import (
    initialize_distributed, make_mesh, put_host_local_batch)
initialize_distributed(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

import numpy as np
import jax.numpy as jnp
mesh = make_mesh(n_data=4, n_model=1)

# Global batch rows 0..3; this host owns rows [2*pid, 2*pid+1].
local = {
    "x": np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 10 * (2 * pid)
         + np.array([[0.0], [10.0]]),
    "n": np.array([2 * pid, 2 * pid + 1], np.int32),
}
batch = put_host_local_batch(mesh, local)
assert batch["x"].shape == (4, 3), batch["x"].shape
assert batch["n"].shape == (4,), batch["n"].shape

total = jax.jit(lambda b: (jnp.sum(b["x"]), jnp.sum(b["n"])))(batch)
got = (float(total[0]), float(total[1]))
# global row r sums: r0=3, r1=12+30, r2=3+60, r3=12+90 -> 2*15 + 30*(0+1+2+3)
want = (2 * 15.0 + 30.0 * (0 + 1 + 2 + 3), float(0 + 1 + 2 + 3))
assert got == want, (got, want)
print(f"proc{pid} OK", flush=True)
"""


def test_two_process_cpu_cluster():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(port), str(pid)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True,
                         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process cluster timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} rc={p.returncode}:\n{out[-3000:]}"
        assert f"proc{pid} OK" in out


def test_initialize_distributed_raises_on_bad_explicit_args():
    """Explicit cluster args that cannot connect must raise, not silently
    degrade to single-host (round-1 weakness W5)."""
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS']='cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from mocov2_whisper_flamingo_tpu.parallel import initialize_distributed\n"
        "try:\n"
        "    initialize_distributed('localhost:1', 2, 5)\n"
        "except Exception as e:\n"
        "    print('RAISED', type(e).__name__)\n"
        "else:\n"
        "    print('SWALLOWED')\n"
    )
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=120,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "RAISED" in out.stdout, out.stdout + out.stderr
