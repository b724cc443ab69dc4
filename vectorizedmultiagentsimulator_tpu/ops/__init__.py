from vectorizedmultiagentsimulator_tpu.ops import geometry, raycast  # noqa: F401
