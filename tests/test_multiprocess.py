"""True multi-process distributed test (VERDICT r3 #2; SURVEY §4(4)).

Spawns 2 real processes that join a JAX distributed system
(``jax.distributed.initialize``, CPU backend, 2 local devices each) and
exercise the cross-process code paths for real — the
``process_allgather`` branch of ``multihost_native_gfpush``, a GSPMD
train step over the global 4-device mesh, both ``dist_exact_propagate``
exchange branches, a vocab-sharded SPARSE (MAG) train step, and the full
sparse trainer end-to-end with world>1 checkpoint + metrics
(rank-0-writes, row-padded restore, resume) — each asserted against
single-process results inside ``tests/multiproc_worker.py``.
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multiproc_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    world = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(world), str(port),
             str(tmp_path)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for rank in range(world)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} OK" in out, f"rank {rank} no OK marker:\n{out}"
