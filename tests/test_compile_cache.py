"""Persistent-compilation-cache plumbing (utils/compile_cache.py).

The at-scale effect (minutes of remote TPU compile skipped on second
process start) is measured in bench_results/scaling.jsonl warm rows; these
tests cover the host-side contract: idempotence, env-var disable, and
respect for a caller-set cache dir.
"""

import os

import jax
import pytest

from osr_tpu.utils import compile_cache


@pytest.fixture(autouse=True)
def _reset(tmp_path, monkeypatch):
    # Isolate every test: fresh module state, no ambient config/env.
    monkeypatch.setattr(compile_cache, "_enabled_dir", None)
    monkeypatch.setattr(
        compile_cache, "_DEFAULT_DIR", str(tmp_path / "default")
    )
    monkeypatch.delenv("OSR_TPU_COMPILE_CACHE", raising=False)
    prior = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prior)


def test_default_off_on_cpu_backend():
    # Default-on is accelerator-only: CPU compiles are local/fast and
    # reloading CPU AOT results across feature sets risks SIGILL.
    # (The test suite pins JAX_PLATFORMS=cpu, so the gate is active.)
    assert jax.default_backend() == "cpu"
    assert compile_cache.enable_persistent_cache() is None


def test_explicit_path_created_and_idempotent(tmp_path):
    target = str(tmp_path / "explicit")
    first = compile_cache.enable_persistent_cache(target)
    assert first == target
    assert os.path.isdir(first)
    assert jax.config.jax_compilation_cache_dir == first
    assert compile_cache.enable_persistent_cache(target) == first


def test_env_off_disables(monkeypatch):
    monkeypatch.setenv("OSR_TPU_COMPILE_CACHE", "off")
    assert compile_cache.enable_persistent_cache() is None


def test_env_path_overrides_default(tmp_path, monkeypatch):
    target = str(tmp_path / "env_dir")
    monkeypatch.setenv("OSR_TPU_COMPILE_CACHE", target)
    assert compile_cache.enable_persistent_cache() == target
    assert os.path.isdir(target)


def test_respects_caller_set_dir(tmp_path):
    preset = str(tmp_path / "caller")
    jax.config.update("jax_compilation_cache_dir", preset)
    assert compile_cache.enable_persistent_cache() == preset
    # And an explicit path argument does not clobber the caller's choice.
    assert compile_cache.enable_persistent_cache(str(tmp_path / "x")) == preset
