"""Test harness: force an 8-device virtual CPU platform so sharding and
collective paths are testable without TPU hardware (SURVEY §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

# The axon TPU plugin (sitecustomize) force-selects jax_platforms="axon,cpu",
# so the env var alone is not enough — override via config before any
# backend use. Tests run on an 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def dummy_env(tmp_path_factory):
    """Small synthetic dataset: manifest CSV + npy bags + TaskConfig."""
    from toad_tpu.data.synthetic import dummy_task, write_dummy_bags, write_dummy_csv

    root = tmp_path_factory.mktemp("dummy")
    csv_path = root / "dummy.csv"
    manifest = write_dummy_csv(csv_path, n_patients=60, max_slides_per_patient=2, seed=0)
    task = dummy_task(str(csv_path))
    data_dir = root / "bags"
    write_dummy_bags(data_dir, manifest, task, n_patches_range=(32, 200), dim=64, fmt="npy", seed=0)
    return {"root": root, "csv": csv_path, "task": task, "data_dir": data_dir, "manifest": manifest, "dim": 64}
