"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so the full engine —
including multi-device sharding — executes anywhere without TPU hardware
(SURVEY.md §4: this deliberately exceeds the reference, whose GPU tests
could not run in its own CI).  Set WARPDB_TEST_TPU=1 to run on real
devices instead.
"""

import os

if not os.environ.get("WARPDB_TEST_TPU"):
    # The axon TPU plugin's sitecustomize calls
    # jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
    # so plain env vars cannot win — override through the config API
    # before any backend initialises.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
else:
    # On-chip runs reuse remotely-compiled executables across
    # invocations (the relay compile is 20-120 s per kernel otherwise).
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return REPO_ROOT / "data"


@pytest.fixture(autouse=True)
def _chdir_repo_root(monkeypatch):
    """Run every test from the repo root (relative data paths, custom.py
    discovery — mirroring the reference tests' run-from-repo-root rule)."""
    monkeypatch.chdir(REPO_ROOT)
