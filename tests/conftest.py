import os

# Physics/numerics tests run on a REAL local CPU backend for speed and
# determinism (the environment may register a remote TPU plugin via
# sitecustomize; `jax.config.update` below overrides it even though jax is
# already imported at that point).  Multi-chip sharding is validated on a
# virtual 8-device CPU mesh; the driver separately dry-runs
# __graft_entry__.dryrun_multichip.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: the golden-parity suite compiles several
# large unrolled physics graphs; caching makes repeat runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vmt")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
