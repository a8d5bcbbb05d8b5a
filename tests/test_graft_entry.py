"""Driver entry points (__graft_entry__.py) stay green in-suite: the driver
runs them out-of-band, but a regression should surface at test time, not at
judging time. Runs on the 8-device virtual CPU mesh like everything else."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_compiles_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    shapes = jax.eval_shape(fn, *args)
    leaves = jax.tree.leaves(shapes)
    assert leaves, "entry() produced no outputs"
    out = fn(*args)  # actually execute once
    assert all(bool(jax.numpy.isfinite(x).all()) for x in jax.tree.leaves(out))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any sharding/compile failure


def test_dryrun_multichip_with_foreign_default_platform():
    """Round-1 regression: the driver runs dryrun_multichip WITHOUT this
    suite's jax_platforms=cpu override, so the default backend is the axon
    TPU plugin (1 device, possibly version-skewed libtpu) and the dryrun
    falls back to virtual CPU devices. Eager ops (model.init, jnp.asarray)
    must be pinned to those CPU devices — in round 1 they dispatched to the
    TPU and crashed (MULTICHIP_r01.json). Reproduce the driver env in a
    subprocess: no jax_platforms override, sitecustomize free to pick the
    TPU plugin as default."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the default platform be whatever the env picks
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
            cwd=str(Path(__file__).parent.parent),
            env=env,
            capture_output=True,
            text=True,
            timeout=240,
            start_new_session=True,
        )
    except subprocess.TimeoutExpired:
        import pytest

        pytest.skip("subprocess JAX init timed out (contended TPU tunnel)")
    assert proc.returncode == 0, f"dryrun failed under foreign default platform:\n{proc.stdout}\n{proc.stderr}"
    assert "dryrun_multichip(8)" in proc.stdout
