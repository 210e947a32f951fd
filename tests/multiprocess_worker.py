"""Worker for the REAL 2-process multi-controller test (launched by
tests/test_multiprocess.py, one subprocess per jax process).

Exercises the `jax.process_count() > 1` branch of
``MeshContext.shard_host_batch`` (core/mesh.py) end-to-end: disjoint
process-strided Batcher slices -> ``jax.make_array_from_process_local_data``
global assembly -> ONE jitted train step with global-batch loss semantics.
This is the multi-controller equivalent of the reference's
DistributedSampler + DDP all-reduce (datamodule.py:120-128, trainer_ddp.py),
which the round-2 suite only simulated in a single process.

Each process prints one JSON line {"loss": ..., "grad_norm": ..., "labels": [...]}
computed from the GLOBAL batch; the parent asserts both processes agree and
that the value matches a single-process numpy reference.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp

    from mammo_clip_tpu.core.mesh import MeshContext
    from mammo_clip_tpu.data.pipeline import Batcher

    # deterministic synthetic dataset: every process can materialize the full
    # table, but each Batcher enumerates ONLY its process-strided slice
    N, D = 64, 8
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(N, 16, D)).astype(np.float32)  # (N, H=16, W=D) "images"
    labels = (np.arange(N) % 2).astype(np.int32)

    class DS:
        def __len__(self):
            return N

        def __getitem__(self, i):
            return {"image": np.asarray(feats[i] * 127 + 128, np.uint8),
                    "label": int(labels[i])}

    bat = Batcher(DS(), tokenizer=None, batch_size=8, shuffle=True, seed=3)
    assert bat.process_index == pid and bat.process_count == nproc

    ctx = MeshContext.create()  # ('data','model') = (8, 1) over both processes
    assert ctx.num_devices == 8

    w = jnp.zeros((16 * D,), jnp.float32)

    def loss_fn(w, batch):
        x = batch["images"].astype(jnp.float32).reshape(batch["images"].shape[0], -1)
        logits = x @ w
        y = batch["labels"].astype(jnp.float32)
        # global-batch mean: GSPMD reduces over the full sharded batch
        return jnp.mean((logits - y) ** 2)

    @jax.jit
    def step(w, batch):
        l, g = jax.value_and_grad(loss_fn)(w, batch)
        return l, jnp.linalg.norm(g)

    local = next(iter(bat))
    # Batcher.batch_size is PER-PROCESS; the global batch concatenates the
    # process slices in process order (mesh device order = process order here)
    assert local["images"].shape[0] == 8
    batch = ctx.shard_host_batch({"images": local["images"],
                                  "labels": local["labels"]})
    assert batch["images"].shape[0] == 8 * nproc  # global leading dim
    l, gn = step(w, batch)

    # numpy reference over the reconstructed GLOBAL batch (device order: the
    # global permutation's process-strided interleave, process p owns rows
    # p::nproc of each global batch of 16)
    order = np.random.default_rng(3 * 100_003 + 0).permutation(N)
    rows = [order[p::nproc][:8] for p in range(nproc)]
    gidx = np.concatenate(rows)
    gx = (np.asarray(feats[gidx] * 127 + 128, np.uint8)).astype(np.float32)
    gx = gx.reshape(len(gidx), -1)
    gy = labels[gidx].astype(np.float32)
    ref = float(np.mean((gx @ np.zeros((16 * D,)) - gy) ** 2))

    out = {"process": pid, "loss": float(l), "grad_norm": float(gn), "ref": ref}
    print(json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
