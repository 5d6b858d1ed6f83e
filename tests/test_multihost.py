"""Real multi-process jax.distributed tests (the N>=2 hosts scaling point).

Spawns actual OS processes, each with its own JAX runtime contributing 2
virtual CPU devices; a coordinator service links them and the framework's
sharded wideband training step runs over the global mesh — halo-exchange
ppermutes and gradient psums cross true process boundaries (the DCN analog),
not just a single-process simulated mesh.
"""

import re
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _run_fleet(nprocs: int, port: int, timeout: float = 240.0):
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nprocs), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=Path(__file__).parents[1],
        )
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return procs, outs


@pytest.mark.slow
class TestMultiProcessDistributed:
    def test_two_process_sharded_train_step(self):
        procs, outs = _run_fleet(2, 47611)
        losses = []
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
            m = re.search(r"MHOK pid=\d+ procs=2 loss=([-\d.]+)", out)
            assert m, f"no MHOK line in:\n{out[-2000:]}"
            losses.append(float(m.group(1)))
        # the replicated loss must agree across processes
        assert losses[0] == pytest.approx(losses[1], abs=1e-6)

    def test_four_process_fleet(self):
        """4 processes x 2 devices: the mesh is (time=2, channel=4) and
        channel-axis collectives span all four processes."""
        procs, outs = _run_fleet(4, 47613)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{out[-2000:]}"
            assert re.search(r"MHOK pid=\d+ procs=4", out), out[-500:]
