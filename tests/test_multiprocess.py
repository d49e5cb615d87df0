"""True multi-process distributed run: 2 local processes × 4 virtual CPU
devices, brought up with ``jax.distributed.initialize`` through
``spmv_tpu.dist.mesh.init_distributed`` — proving the multi-host entry
point is live code (the reference's multi-device loop never ran past
device 0, ``coo.c:30,274``)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ≥2 formats × ragged/even row counts × both x paths (round-3 verdict
# item 10): 1021 % 8 devices ≠ 0 exercises the padded last shard through
# init_distributed/put_sharded — the most fragile true-multi-host path.
@pytest.mark.parametrize("fmt,nrows,gather_x", [
    ("cmrs", 1024, True),   # the BASELINE.json multi-host config
    ("hyb", 1021, True),    # two-part plan, ragged last shard
    ("csr", 1021, False),   # replicated x, ragged
    ("sell", 1024, False),  # σ-sort + unpermute epilogue per shard
])
def test_two_process_row_sharded_spmv(fmt, nrows, gather_x):
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), fmt,
             str(nrows), "1" if gather_x else "0"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
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
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: validated" in out, out
