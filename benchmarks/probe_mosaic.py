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



def _timed(name, f, *args, iters=4, group=10):
    import time
    g = jax.jit(f)
    r = g(*args); r.block_until_ready()
    _ = float(jnp.sum(r))
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(group):
            r = g(*args)
        _ = float(jnp.sum(r))  # one sync per group (the relay costs ~30 ms)
        best = min(best, (time.perf_counter() - t0) / group)
    print(f"PROBE {name}: {best*1e3:.2f} ms")


def probe_grid_overhead():
    """Attribute the ~30us/grid-step cost of the MBConv kernels: halo maps
    (min/max = non-affine) vs resident constants vs the compute chain.
    Production-like grid: (16, 29) steps, C=40/E=240, W=384, h_tile=8."""
    N, C, E, H, W, HT = 16, 40, 240, 232, 384, 8
    ntl = H // HT
    x = jnp.asarray(np.random.default_rng(0).standard_normal((N, C, H, W)),
                    jnp.bfloat16)
    k = jnp.asarray(np.random.default_rng(1).standard_normal((E, 9, W)),
                    jnp.bfloat16)
    vec = jnp.asarray(np.random.default_rng(2).standard_normal((E, 1, W)),
                      jnp.bfloat16)
    we = jnp.asarray(np.random.default_rng(3).standard_normal((C, E)),
                     jnp.bfloat16)
    xm = pl.BlockSpec((1, C, HT, W), lambda n, i: (n, 0, i, 0),
                      memory_space=pltpu.VMEM)
    xt = pl.BlockSpec((1, C, 8, W), lambda n, i: (n, 0, jnp.maximum(i - 1, 0), 0),
                      memory_space=pltpu.VMEM)
    xb = pl.BlockSpec((1, C, 8, W),
                      lambda n, i: (n, 0, jnp.minimum(i + 1, ntl - 1), 0),
                      memory_space=pltpu.VMEM)
    outspec = pl.BlockSpec((C, 1, 1), lambda n, i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((C, 1, 1), jnp.float32)

    def base_kernel(xm_ref, o_ref):
        i = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += jnp.sum(jnp.sum(xm_ref[0].astype(jnp.float32), axis=2,
                                    keepdims=True), axis=1, keepdims=True)

    _timed("grid_base(main only)", pl.pallas_call(
        base_kernel, grid=(N, ntl), in_specs=[xm], out_shape=oshape,
        out_specs=outspec), x)

    def halo_kernel(xm_ref, xt_ref, xb_ref, o_ref):
        i = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        t = xm_ref[0].astype(jnp.float32) + \
            xt_ref[0, :, 7:8, :].astype(jnp.float32) + \
            xb_ref[0, :, 0:1, :].astype(jnp.float32)
        o_ref[:] += jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1,
                            keepdims=True)

    _timed("grid_halo(min/max maps)", pl.pallas_call(
        halo_kernel, grid=(N, ntl), in_specs=[xm, xt, xb], out_shape=oshape,
        out_specs=outspec), x, x, x)

    kspec = pl.BlockSpec((E, 9, W), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((E, 1, W), lambda n, i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    wespec = pl.BlockSpec((C, E), lambda n, i: (0, 0), memory_space=pltpu.VMEM)

    def const_kernel(xm_ref, k_ref, v_ref, o_ref):
        i = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        t = xm_ref[0].astype(jnp.float32) + \
            jnp.sum(k_ref[:, 0:1, :].astype(jnp.float32)) + \
            jnp.sum(v_ref[:].astype(jnp.float32))
        o_ref[:] += jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1,
                            keepdims=True)

    _timed("grid_const(resident bank)", pl.pallas_call(
        const_kernel, grid=(N, ntl), in_specs=[xm, kspec, vspec],
        out_shape=oshape, out_specs=outspec), x, k, vec)

    def compute_kernel(xm_ref, we_ref, k_ref, o_ref):
        i = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (i == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        xp = xm_ref[0]
        z = jax.lax.dot_general(
            we_ref[:], xp.reshape(C, HT * W),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        zr = z.reshape(E, HT, W)
        w = (zr.astype(jnp.float32) * jax.nn.sigmoid(zr.astype(jnp.float32))
             ).astype(jnp.bfloat16)
        d = None
        wp_ = jnp.pad(w, ((0, 0), (0, 0), (1, 1)))
        for a in range(3):
            for b in range(3):
                tap = k_ref[:, 3 * a + b: 3 * a + b + 1, :]
                term = (wp_[:, :, b: b + W] * tap).astype(jnp.float32)
                d = term if d is None else d + term
        o_ref[:] += jnp.sum(jnp.sum(d[:C], axis=2, keepdims=True), axis=1,
                            keepdims=True)

    _timed("grid_compute(z+silu+dw, no halo)", pl.pallas_call(
        compute_kernel, grid=(N, ntl), in_specs=[xm, wespec, kspec],
        out_shape=oshape, out_specs=outspec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)), x, we, k)


PROBES["grid_overhead"] = probe_grid_overhead


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for n in names:
        PROBES[n]()
