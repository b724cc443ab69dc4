import os

# Physics/numerics tests run on a REAL local CPU backend for speed and
# determinism (the environment may register a remote TPU plugin via
# sitecustomize; `jax.config.update` below overrides it even though jax is
# already imported at that point).  Multi-chip sharding is validated on a
# virtual 8-device CPU mesh; the driver separately dry-runs
# __graft_entry__.dryrun_multichip.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: OPT-IN via JAX_COMPILATION_CACHE_DIR.
# Not defaulted on: XLA:CPU executable serialization has segfaulted
# mid-suite on some hosts (put_executable_and_time writing the huge
# road_traffic step after ~150 tests, 2026-08-17), and cross-host AOT
# entries can SIGILL on load after a VM migration.  A plain `pytest
# tests/` therefore runs cache-less (as the reference suite does);
# developers who want fast reruns export the env var explicitly.
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _CACHE_DIR:
    # sitecustomize may have imported jax before this file ran, in which
    # case the env var was read too late — set the config directly too.
    # The thresholds honor explicit env values (setdefault above), so a
    # READ-ONLY rerun — loads cached entries, never serializes new ones,
    # sidestepping the mid-suite serialization segfault — is:
    #   JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1e9 pytest tests/
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
    )
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes",
        int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
    )


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop JAX's in-process executable caches after every test module.

    Long single-process runs of the full suite accumulate hundreds of
    live XLA:CPU executables; on some hosts the NEXT big compile then
    segfaults inside backend_compile_and_load (seen twice 2026-08-20 at
    test_scenario_parity's first large cold compile, ~250 tests /
    ~4 GB RSS into the run — the same compile succeeds in a fresh
    process).  Per-module cache clearing keeps the live-executable pool
    small; with the persistent compile cache enabled the re-compiles
    this causes are disk loads.
    """
    yield
    jax.clear_caches()
    gc.collect()
