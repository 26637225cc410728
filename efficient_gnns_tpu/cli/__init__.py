"""CLI entry points (one per workload, mirroring the reference's script
dirs) plus the sweep runner and result aggregator."""

import os


def apply_platform(platform=None):
    """Honor an explicit JAX platform request.

    Under environments whose sitecustomize force-pins ``jax_platforms``
    (e.g. a TPU tunnel plugin), setting the env var is not enough — the
    config must be updated after importing jax. Accepts the value from a
    ``--platform`` flag or the ``EGT_PLATFORM`` env var.
    """
    platform = platform or os.environ.get("EGT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
