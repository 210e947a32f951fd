"""The weak-scaling harness (benchmarks/multichip_scaling.py) must stay
runnable end-to-end: on a real pod it is the one-command scaling curve
(ROADMAP #6), so its selftest — mesh sweep, (K,B,...) super-batch sharding,
the group-dispatch/scalar-fetch sync protocol — is certified here on the
same 8-device virtual CPU mesh the rest of tests/ uses."""

import json
import io
import contextlib

import jax


def _restore_prng_impl():
    return jax.config.jax_default_prng_impl


def test_selftest_sweeps_meshes_and_reports_efficiency(capsys):
    import benchmarks.multichip_scaling as ms

    prng_impl = jax.config.jax_default_prng_impl
    try:
        results = ms.main([
            "--selftest", "--mesh-sizes", "1,2", "--measure-steps", "5",
            "--steps-per-call", "2",
        ])
    finally:
        jax.config.update("jax_default_prng_impl", prng_impl)

    assert [r["n_devices"] for r in results] == [1, 2]
    for r in results:
        assert r["platform"] == "cpu"
        assert r["ms_per_step"] > 0
        # weak scaling: global batch grows with the data-parallel size
        assert r["global_batch"] == 2 * r["n_devices"]
        import numpy as np

        assert np.isfinite(r["warm_loss"])

    out_lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
                 if ln.startswith("{")]
    # one JSON line per mesh size + the summary line, all parseable
    parsed = [json.loads(ln) for ln in out_lines]
    summary = parsed[-1]
    assert summary["metric"].startswith("weak_scaling_tiny_cpu")
    assert set(summary["efficiency"]) == {"1", "2"}
    assert summary["efficiency"]["1"] == 1.0
    assert summary["steps_per_call"] == 2


def test_seq_parallel_sweep_runs_and_labels_results(capsys):
    """--seq-parallel (r5): the SP constraint traces under the active mesh and
    the result rows record whether SP was actually in effect (tp>1)."""
    import benchmarks.multichip_scaling as ms

    prng_impl = jax.config.jax_default_prng_impl
    try:
        results = ms.main([
            "--selftest", "--mesh-sizes", "1,4", "--measure-steps", "5",
            "--steps-per-call", "1", "--tp", "2", "--seq-parallel",
        ])
    finally:
        jax.config.update("jax_default_prng_impl", prng_impl)

    import numpy as np

    by_n = {r["n_devices"]: r for r in results}
    # n=1 cannot host tp=2 -> falls back to tp=1, SP inert; n=4 runs 2x2 with SP
    assert by_n[1]["seq_parallel"] is False
    assert by_n[4]["seq_parallel"] is True
    assert by_n[4]["mesh"].get("model") == 2
    for r in results:
        assert np.isfinite(r["warm_loss"])


def test_mesh_sizes_beyond_available_are_skipped(capsys):
    import benchmarks.multichip_scaling as ms

    prng_impl = jax.config.jax_default_prng_impl
    try:
        results = ms.main([
            "--selftest", "--mesh-sizes", "1,64", "--measure-steps", "5",
            "--steps-per-call", "1",
        ])
    finally:
        jax.config.update("jax_default_prng_impl", prng_impl)
    assert [r["n_devices"] for r in results] == [1]
