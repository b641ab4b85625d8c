"""Platform selection helper.

Some environments pin JAX to an accelerator plugin via sitecustomize in a way
that ignores the JAX_PLATFORMS env var; `jax.config.update` still wins. Call
this before first device use so `JAX_PLATFORMS=cpu python tools/...` behaves
as documented."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
