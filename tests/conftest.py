import os

# Force a virtual 8-device CPU platform for tests: multi-chip sharding is
# validated on a host-device mesh (the driver separately dry-runs
# __graft_entry__.dryrun_multichip); physics/numerics tests run on CPU for
# speed and determinism.
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
