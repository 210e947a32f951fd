"""Activation-sharding constraints (sequence parallelism).

Megatron-style sequence parallelism for the text tower: between the
tensor-parallel blocks (LayerNorm / dropout / residual regions, which TP leaves
replicated) the (B, S, H) activations are sharded along the SEQUENCE dim over
the same 'model' axis the TP weights use. Under GSPMD a constraint is all it
takes — XLA converts the row-split matmul's all-reduce into a reduce-scatter
and inserts the all-gather in front of the next column-split matmul (the
classic SP collective rewrite), and the LN/dropout/residual work and
activation memory drop by the TP degree.

The reference has no tensor parallelism at all (DDP only,
reference: trainer_ddp.py:134); this is TPU-native beyond-reference capability,
opt-in via ``model.text_encoder.seq_parallel`` and inert (a no-op) unless the
jitted caller runs under an active mesh context (``with jax.set_mesh(mesh):``)
whose 'model' axis divides the sequence length.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

# The TP axis name used across the framework (parallel/partitioning.py).
MODEL_AXIS = "model"


def _active_axis_size(axis: str) -> int:
    """Size of ``axis`` in the mesh context the current trace runs under, or 0
    when no mesh context is active / the axis is absent. Reads the abstract
    mesh, which reflects ``jax.set_mesh(...)`` both inside and outside jit."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh.empty or axis not in mesh.axis_names:
        return 0
    return dict(mesh.shape)[axis]

def shard_seq(x: jax.Array, axis: str = MODEL_AXIS) -> jax.Array:
    """Constrain a (B, S, H) activation to be sharded along S over ``axis``.

    Batch and hidden dims are left UNCONSTRAINED so the data-parallel batch
    sharding (and anything else GSPMD picked) is preserved. No-op when no mesh
    context is active, the axis is missing or size 1, or S does not divide —
    so the same model code runs unchanged on a single device.
    """
    size = _active_axis_size(axis)
    if size <= 1 or x.ndim < 2 or x.shape[1] % size != 0:
        return x
    spec = P(P.UNCONSTRAINED, axis, *([P.UNCONSTRAINED] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, spec)
