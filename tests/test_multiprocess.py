"""Executed multi-process test of the multi-host input-feed contract.

parallel/input.py claims the same code path runs unchanged under
`jax.distributed.initialize` on a real pod; until r5 no test ever ran more
than one *process* (the 8-device mesh is a single process).  This spawns
two real OS processes, each owning 4 virtual CPU devices, forms the
2-process global mesh, feeds per-process half-batches through
make_global_batch, and checks a cross-process all-reduced white-box
gradient against an analytic single-process oracle (see _mp_worker.py).

Skips gracefully where the distributed runtime can't come up (port
binding unavailable / jax.distributed unsupported on the backend).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
_NPROC = 2


def _free_port():
    s = socket.socket()
    try:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
    except OSError:
        return None
    finally:
        s.close()


def test_two_process_distributed_input_feed_and_psum():
    port = _free_port()
    if port is None:
        pytest.skip("cannot bind a localhost port in this environment")
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               # drop the axon sitecustomize: its register() talks to the
               # TPU relay, which CPU-only subprocesses must not depend on
               PYTHONPATH="/root/repo",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(_NPROC), str(rank)],
        env=env, cwd="/root/repo", text=True,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in range(_NPROC)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers hung (coordinator deadlock?)")
    for p, out in zip(procs, outs):
        if p.returncode == 3 and "DIST_UNAVAILABLE" in out:
            pytest.skip(f"jax.distributed unavailable here: "
                        f"{out.splitlines()[-1]}")
        assert p.returncode == 0, f"rank output:\n{out}"
        assert "MP_OK" in out, out
    # both ranks agree on the globally reduced value
    totals = {line.split("total=")[1]
              for out in outs for line in out.splitlines()
              if line.startswith("MP_OK")}
    assert len(totals) == 1, totals
