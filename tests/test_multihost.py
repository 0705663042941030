"""Two-process jax.distributed smoke test (VERDICT r1 next-step #10): one
data-parallel diffusion train step over a global 8-device mesh spanning two
local processes (4 virtual CPU devices each) — validates the DCN multi-host
path (`parallel/mesh.py::maybe_initialize_distributed`,
``shard_batch_global``) without multi-host hardware."""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train_step():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), str(port)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"jax.distributed unavailable in this environment:\n{out[-500:]}")
        assert p.returncode == 0, f"process {pid} rc={p.returncode}:\n{out[-3000:]}"
        assert f"multihost process {pid}: global_devices=8" in out, out[-2000:]
    # both processes computed the SAME global loss (grads psum'd over DCN)
    l0 = outs[0].split("loss=")[1].split(" ")[0]
    l1 = outs[1].split("loss=")[1].split(" ")[0]
    assert l0 == l1, (l0, l1)
