"""Backend forcing for standalone scripts.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` environment variable, so
scripts that must run on CPU (dry-runs, CI) have to force the backend
through the config API before any device is initialized.  Tools call
:func:`force_platform_from_env` right after fixing ``sys.path``; the test
suite's conftest applies the same config directly.
"""

import os


def force_platform_from_env() -> None:
    """Apply ``JAX_PLATFORMS`` (when set) via ``jax.config``.  Must run
    before anything touches a device; a no-op when the variable is
    unset (normal TPU runs)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
