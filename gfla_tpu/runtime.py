"""Runtime configuration: persistent compilation cache + platform setup.

Every entry point calls `setup_runtime()` once before building models.
The persistent XLA compilation cache makes repeat CLI invocations (train →
test → bench) skip the 20-40s first-compile cost (SURVEY environment
notes); it is keyed on HLO so shape changes recompile safely.
"""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str | None = None, platform: str | None = None):
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    cache = cache_dir or os.environ.get(
        "GFLA_COMPILATION_CACHE", os.path.expanduser("~/.cache/gfla_xla")
    )
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs — cache is best-effort
    return jax
