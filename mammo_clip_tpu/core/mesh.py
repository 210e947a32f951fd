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
``replica`` cross-slice data-parallel axis for multi-pod / multi-slice training
           (size 1 by default, i.e. absent from single-slice meshes). Laid out so it
           spans the DCN between TPU slices while 'data' and 'model' stay inside a
           slice on ICI: FSDP param gathers (over 'data') and TP collectives (over
           'model') ride ICI every layer, and only the once-per-step gradient
           all-reduce crosses the slower DCN — the standard multislice recipe.
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
    replica: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh, or ('replica', 'data', 'model') when
    ``replica > 1``. ``data=-1`` absorbs all remaining devices.

    With ``replica > 1`` on real multislice hardware the replica axis is aligned
    with slice boundaries (via ``mesh_utils.create_hybrid_device_mesh``) so it is
    the only axis whose collectives cross the DCN; elsewhere (CPU mesh, single
    slice) it degrades to a plain reshape with 'replica' slowest-varying, which
    preserves the same sharding semantics."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * replica) == 0, (
            f"{n} devices not divisible by model*replica={model * replica}")
        data = n // (model * replica)
    assert replica * data * model == n, (
        f"mesh {replica}x{data}x{model} != {n} devices")
    if replica == 1:
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, axis_names=("data", "model"))
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) == replica:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, data, model),
            dcn_mesh_shape=(replica, 1, 1),
            devices=devices,
        )
    else:
        arr = np.asarray(devices).reshape(replica, data, model)
    return Mesh(arr, axis_names=("replica", "data", "model"))


@dataclasses.dataclass(frozen=True)
class MeshContext:
    """Bundles a mesh with the sharding constructors the rest of the framework uses."""

    mesh: Mesh

    @classmethod
    def create(cls, data: int = -1, model: int = 1, replica: int = 1,
               devices=None) -> "MeshContext":
        return cls(mesh=make_mesh(data=data, model=model, replica=replica,
                                  devices=devices))

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    @property
    def data_parallelism(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_parallelism(self) -> int:
        return self.mesh.shape["model"]

    @property
    def replica_parallelism(self) -> int:
        return dict(self.mesh.shape).get("replica", 1)

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def batch_sharding(self) -> NamedSharding:
        """Leading-axis batch sharding over the data-parallel axes; REPLICATED over
        'model' (identical to sharding over everything when model=1, i.e. every
        production config). Megatron semantics: a TP group's members hold the SAME
        examples so activations can be channel-sharded over 'model' without GSPMD
        resharding the batch at every TP layer (the involuntary-rematerialization
        SPMD warnings the 2x2x2 dryrun used to emit)."""
        axes = tuple(a for a in self.mesh.axis_names if a != "model")
        return self.sharding(axes)

    @property
    def stacked_batch_sharding(self) -> NamedSharding:
        """Sharding for (K, B, ...) super-batches of the fused K-step train call
        (train/step.make_train_multistep): steps axis replicated, batch axis
        sharded exactly like batch_sharding."""
        axes = tuple(a for a in self.mesh.axis_names if a != "model")
        return self.sharding(None, axes)

    @property
    def replicated(self) -> NamedSharding:
        return self.sharding()

    def global_batch_size(self, per_device: int) -> int:
        """Distinct examples per step: per-device batch x batch-CARRYING devices.
        batch_sharding replicates the batch over 'model' (TP-group members hold
        the same examples), so counting all devices would silently inflate each
        data shard's example count (and activation memory) by
        model_parallelism whenever model > 1."""
        return per_device * (self.num_devices // self.model_parallelism)

    def shard_host_batch(self, batch, stacked: bool = False):
        """Place a host-resident pytree of numpy arrays onto the mesh, batch-sharded.

        Single-process: a plain sharded device_put. Multi-host SPMD: each process
        passes only ITS slice of the global batch (the Batcher enumerates
        process_index-strided indices) and jax assembles the global array from the
        per-process shards — the multi-controller equivalent of DistributedSampler
        + NCCL scatter in the reference's DDP path (trainer_ddp.py).

        stacked=True: the batch carries a leading (K,) steps axis (fused K-step
        call) — shard axis 1 instead of axis 0."""
        sh = self.stacked_batch_sharding if stacked else self.batch_sharding
        if jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sh, x),
                batch,
            )
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
