import os

# Force a virtual 8-device CPU platform for tests: multi-chip sharding is
# validated on a host-device mesh (the driver separately dry-runs
# __graft_entry__.dryrun_multichip); physics/numerics tests run on CPU for
# speed and determinism.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
