"""Persistent compilation cache: population, reuse, and the off switch."""

import os
import subprocess
import sys

import pytest

from distance_tpu.utils.jitcache import enable_jit_cache

FASTA = b">a\nACGTACGTACGTACGT\n>b\nACGTACGTACGTTTTT\n>c\nAAGTACGTACGTACGT\n"


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """enable_jit_cache mutates process-wide jax config; restore it so
    tests running after this module don't inherit a persistent-cache
    config pointed at a deleted pytest tmp dir (the very configuration
    jitcache's docstring warns risks SIGILL on XLA:CPU reload)."""
    import jax

    keys = (
        "jax_compilation_cache_dir",
        "jax_persistent_cache_min_compile_time_secs",
        "jax_persistent_cache_min_entry_size_bytes",
    )
    saved = {k: getattr(jax.config, k) for k in keys}
    try:
        yield
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


def test_enable_returns_dir_and_sets_config(tmp_path, monkeypatch):
    d = tmp_path / "jit"
    monkeypatch.setenv("DISTANCE_TPU_JIT_CACHE", str(d))
    assert enable_jit_cache() == str(d)
    assert d.is_dir()
    import jax

    assert jax.config.jax_compilation_cache_dir == str(d)


def test_disabled_by_zero(monkeypatch):
    monkeypatch.setenv("DISTANCE_TPU_JIT_CACHE", "0")
    assert enable_jit_cache() is None


def test_default_location_under_cache_home(tmp_path, monkeypatch):
    monkeypatch.delenv("DISTANCE_TPU_JIT_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    # accelerator platform: default-on
    monkeypatch.setenv("DISTANCE_TPU_JAX_PLATFORM", "tpu")
    path = enable_jit_cache()
    assert path == str(tmp_path / "distance_tpu" / "jit")


def test_default_off_on_cpu(tmp_path, monkeypatch):
    # XLA:CPU AOT executables are machine-specific (reload prints
    # feature-mismatch errors / risks SIGILL), so the cache must stay
    # off by default there; explicit DISTANCE_TPU_JIT_CACHE opts in.
    monkeypatch.delenv("DISTANCE_TPU_JIT_CACHE", raising=False)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    monkeypatch.setenv("DISTANCE_TPU_JAX_PLATFORM", "cpu")
    assert enable_jit_cache() is None
    monkeypatch.setenv("DISTANCE_TPU_JIT_CACHE", str(tmp_path / "jit"))
    assert enable_jit_cache() == str(tmp_path / "jit")


def _run_cli(args, cache_dir, input_data):
    env = dict(
        os.environ,
        DISTANCE_TPU_JIT_CACHE=str(cache_dir),
        DISTANCE_TPU_JAX_PLATFORM="cpu",
    )
    return subprocess.run(
        [sys.executable, "-m", "distance_tpu.cli"] + args,
        input=input_data, capture_output=True, env=env,
    )


def test_cli_populates_cache_and_reuses(tmp_path):
    cache = tmp_path / "jit"
    r1 = _run_cli(["-m", "raw", "--backend", "xla"], cache, FASTA)
    assert r1.returncode == 0, r1.stderr
    entries = set(os.listdir(cache))
    assert entries, "first run should write compiled executables"
    r2 = _run_cli(["-m", "raw", "--backend", "xla"], cache, FASTA)
    assert r2.returncode == 0, r2.stderr
    assert r2.stdout == r1.stdout
    # a hot second run adds no new entries for the same shapes/measure
    assert set(os.listdir(cache)) == entries
