"""Persistent XLA compilation cache setup.

Tunnel/remote-compile environments pay minutes per fresh compile; the
persistent cache turns identical-program recompiles into millisecond disk
hits across processes (progressive resume, bench reruns, driver rounds).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/raytracer_tpu_jax")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("RAYTPU_COMPILE_CACHE", DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
