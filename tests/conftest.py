import os

# Physics/numerics tests run on a REAL local CPU backend for speed and
# determinism (the environment may register a remote TPU plugin via
# sitecustomize; `jax.config.update` below overrides it even though jax is
# already imported at that point).  Multi-chip sharding is validated on a
# virtual 8-device CPU mesh; the driver separately dry-runs
# __graft_entry__.dryrun_multichip.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the golden-parity suite compiles several
# large unrolled physics graphs; caching makes repeat runs fast.  The
# default dir is keyed by a host-CPU fingerprint: XLA:CPU AOT entries
# from a host with different CPU features crash (SIGILL) on load after
# a VM migration (seen 2026-08-17).


def _cpu_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    return "nofp"


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_cache_vmt_{_cpu_fingerprint()}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# sitecustomize may have imported jax before this file ran, in which case
# the env vars above were read too late — set the config directly too.
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
