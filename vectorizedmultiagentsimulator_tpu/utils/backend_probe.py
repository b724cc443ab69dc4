"""Reachability probe for remote-accelerator JAX backends.

The bench image exposes its single TPU chip through a network tunnel
(``JAX_PLATFORMS=axon``).  When that tunnel is down, ``jax.devices()``
blocks forever inside PJRT client creation — there is no timeout on the
dial — which turns any benchmark or compile-check into a silent hang.

``ensure_reachable_backend()`` probes backend initialization in a
*subprocess* with a wall-clock timeout and, when the default platform
does not come up, flips the current process to the local CPU platform
(``jax.config.update("jax_platforms", "cpu")``) *before* any backend is
initialized here, so callers degrade to a slow-but-valid run instead of
hanging.

This is TPU-native plumbing with no reference counterpart (the
reference runs on a local CUDA device and can't lose its accelerator
mid-flight); cf. SURVEY.md §5.3 "failure detection".
"""
from __future__ import annotations

import os
import subprocess
import sys

#: Platforms that involve a remote dial and can hang indefinitely.
_REMOTE_PLATFORMS = ("axon",)

_PROBE_SNIPPET = (
    "import jax; d = jax.devices();"
    " print(d[0].platform, len(d), flush=True)"
)


def backend_is_reachable(timeout: float | None = None) -> bool:
    """True iff default-platform backend init completes within ``timeout``.

    Runs ``jax.devices()`` in a fresh subprocess (inheriting the
    environment, including the sitecustomize plugin registration) so a
    hung dial cannot wedge the calling process.
    """
    if timeout is None:
        timeout = float(os.environ.get("VMT_BACKEND_PROBE_TIMEOUT", "300"))
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SNIPPET],
            timeout=timeout,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0


def ensure_reachable_backend(timeout: float | None = None) -> str:
    """Return the platform the current process should use.

    - If the default platform is local (cpu/tpu-without-tunnel), trust it.
    - If it is a remote-dial platform, probe it in a subprocess; on
      failure, force this process onto CPU (must be called before any
      JAX backend initialization in this process) and return ``"cpu"``.

    Set ``VMT_SKIP_BACKEND_PROBE=1`` to skip probing entirely.
    """
    platforms = os.environ.get("JAX_PLATFORMS", "")
    remote = any(p in platforms for p in _REMOTE_PLATFORMS)
    if not remote or os.environ.get("VMT_SKIP_BACKEND_PROBE") == "1":
        return platforms or "default"
    if backend_is_reachable(timeout):
        return platforms
    import jax

    jax.config.update("jax_platforms", "cpu")
    print(
        "WARNING: remote accelerator backend "
        f"({platforms!r}) unreachable within probe timeout; "
        "falling back to local CPU.",
        file=sys.stderr,
        flush=True,
    )
    return "cpu"
