"""Device mesh / distributed context.

Replaces the reference's ``GlobalEnv`` singleton + ``torch.distributed`` NCCL bootstrap
(reference: breastclip/util/global_env.py:15-34, trainer_ddp.py:54-63). On TPU there is no
process-group rendezvous to manage — the JAX runtime owns the collective fabric — so this
module is a thin, *stateless* layer: build a named mesh once, derive shardings from it, and
gate host I/O on process index 0 (the reference gates on ``GlobalEnv.master``).

Axes
----
``data``   batch-parallel axis (reference's only parallelism: DDP, trainer_ddp.py:134).
           Contrastive global-batch negatives ride this axis: under GSPMD the loss is
           written over the *global* batch and XLA inserts the all-gather over ICI,
           replacing the reference's hand-rolled DistAutogradAllGatherFunction
           (util/dist_autograd.py:5-27).
``model``  tensor-parallel axis for the text-encoder FFN / attention heads and projection
           heads (a capability the reference lacks; kept size 1 by default).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def is_master() -> bool:
    """True on the process that should perform host I/O (checkpoints, logs)."""
    return jax.process_index() == 0


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D ('data', 'model') mesh. ``data=-1`` absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """Bundles a mesh with the sharding constructors the rest of the framework uses."""

    mesh: Mesh

    @classmethod
    def create(cls, data: int = -1, model: int = 1, devices=None) -> "MeshContext":
        return cls(mesh=make_mesh(data=data, model=model, devices=devices))

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_parallelism(self) -> int:
        return self.mesh.shape["model"]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading-axis batch sharding over BOTH mesh axes (pure-DP when model=1)."""
        return self.sharding(("data", "model"))

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    def global_batch_size(self, per_device: int) -> int:
        return per_device * self.num_devices

    def shard_host_batch(self, batch):
        """Place a host-resident pytree of numpy arrays onto the mesh, batch-sharded.

        Single-process: a plain sharded device_put. Multi-host SPMD: each process
        passes only ITS slice of the global batch (the Batcher enumerates
        process_index-strided indices) and jax assembles the global array from the
        per-process shards — the multi-controller equivalent of DistributedSampler
        + NCCL scatter in the reference's DDP path (trainer_ddp.py)."""
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(self.batch_sharding, x),
                batch,
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self.batch_sharding), batch
        )
