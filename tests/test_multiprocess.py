"""REAL multi-controller test of the multi-host input path (VERDICT r2 #6).

Launches TWO actual jax processes (subprocesses, `jax.distributed.initialize`
over a localhost coordinator, 4 virtual CPU devices each = one 8-device global
mesh) and runs the full chain the round-2 suite only simulated:

    disjoint process-strided Batcher slices
      -> MeshContext.shard_host_batch   (the process_count>1 branch,
         jax.make_array_from_process_local_data, core/mesh.py:132-135)
      -> one jitted step with GLOBAL-batch loss semantics.

Parity target: DistributedSampler + DDP all-reduce semantics
(reference: breastclip/data/datamodule.py:120-128, trainer_ddp.py:266-344).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_global_batch_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ)
    # workers manage their own XLA_FLAGS (4 devices each); drop the suite's 8
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # SPMD: every process computes the SAME global loss/grad
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["grad_norm"] == pytest.approx(outs[1]["grad_norm"], rel=1e-6)
    # and it matches the numpy reference over the reconstructed global batch
    for o in outs:
        np.testing.assert_allclose(o["loss"], o["ref"], rtol=1e-5)
