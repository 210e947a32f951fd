"""Tiny Mosaic lowering probes for this pod's remote TPU compile helper.

Each probe is a minimal pallas kernel exercising ONE layout-sensitive primitive;
failures are fast (~1 min round trip), so this is the cheap way to learn the
toolchain's constraint surface before designing kernels around it.

Usage: python benchmarks/probe_mosaic.py [probe ...]   (default: all)
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, H, W = 16, 8, 380
WP = 384  # W padded to the lane tile


def _run(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = jax.jit(f)(*args)
        r.block_until_ready()
        print(f"PROBE {name}: OK {r.shape} sum={float(jnp.sum(r)):.3f}")
    except Exception as e:
        msg = str(e).split("\n")
        key = next((l for l in msg if "Not implemented" in l or "error" in l.lower()), msg[0])
        print(f"PROBE {name}: FAIL {key[:160]}")


def probe_concat_aligned():
    """Lane-concat of 128-multiple-wide pieces (each row padded W->WP)."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        pieces = [jnp.pad(x[:, r, :], ((0, 0), (0, WP - W))) for r in range(H)]
        cat = jnp.concatenate(pieces, axis=-1)  # (C, H*WP), offsets % 128 == 0
        o_ref[:] = jax.lax.dot_general(
            cat, cat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, H, W)), jnp.float32)
    _run("concat_aligned", kernel, jax.ShapeDtypeStruct((C, C), jnp.float32), x)


def probe_reshape_collapse():
    """Shape-cast (C, H, WP) -> (C, H*WP) with lane-tile-aligned minor dim."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (C, H, WP)
        flat = x.reshape(C, H * WP)
        o_ref[:] = jax.lax.dot_general(
            flat, flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, H, WP)), jnp.float32)
    _run("reshape_collapse", kernel, jax.ShapeDtypeStruct((C, C), jnp.float32), x)


def probe_reshape_split():
    """Shape-cast (C, H*WP) -> (C, H, WP) (the inverse, for _project output)."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (C, H, WP)
        flat = x.reshape(C, H * WP)
        y = jax.lax.dot_general(
            jnp.eye(C, dtype=jnp.float32), flat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = y.reshape(C, H, WP)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, H, WP)), jnp.float32)
    _run("reshape_split", kernel, jax.ShapeDtypeStruct((C, H, WP), jnp.float32), x)


def probe_sublane_stack():
    """jnp.stack of (C, w) slices along a new middle (sublane) axis."""
    def kernel(x_ref, o_ref):
        flat = x_ref[:]  # (C, H*WP)
        rows = [flat[:, r * WP: r * WP + WP] for r in range(H)]
        o_ref[:] = jnp.stack(rows, axis=1)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, H * WP)), jnp.float32)
    _run("sublane_stack", kernel, jax.ShapeDtypeStruct((C, H, WP), jnp.float32), x)


def probe_dot_3d_batch():
    """dot_general with a leading batch dim inside the kernel."""
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            w_ref[:], x_ref[:],
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).transpose(1, 0, 2)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, H, WP)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((C, C)), jnp.float32)
    _run("dot_3d_rank3rhs", kernel, jax.ShapeDtypeStruct((H, C, WP), jnp.float32), x, w)


PROBES = {
    "concat_aligned": probe_concat_aligned,
    "reshape_collapse": probe_reshape_collapse,
    "reshape_split": probe_reshape_split,
    "sublane_stack": probe_sublane_stack,
    "dot_3d": probe_dot_3d_batch,
}



def probe_reshape_collapse_rows10():
    """Collapse with a non-8-multiple row count (halo tiles are hT+2 rows)."""
    R = 10

    def kernel(x_ref, o_ref):
        x = x_ref[:]  # (C, 10, WP)
        flat = x.reshape(C, R * WP)
        o_ref[:] = jax.lax.dot_general(
            flat, flat, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, R, WP)), jnp.float32)
    _run("reshape_collapse_rows10", kernel, jax.ShapeDtypeStruct((C, C), jnp.float32), x)


def probe_reshape_split_rows10():
    R = 10

    def kernel(x_ref, o_ref):
        flat = x_ref[:]  # (C, R*WP)
        o_ref[:] = flat.reshape(C, R, WP) * 2.0

    x = jnp.asarray(np.random.default_rng(0).standard_normal((C, R * WP)), jnp.float32)
    _run("reshape_split_rows10", kernel, jax.ShapeDtypeStruct((C, R, WP), jnp.float32), x)


PROBES["reshape_collapse_rows10"] = probe_reshape_collapse_rows10
PROBES["reshape_split_rows10"] = probe_reshape_split_rows10


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n]()
