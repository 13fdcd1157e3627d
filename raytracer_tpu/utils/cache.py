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
        # Pallas kernels ride into the HLO as tpu_custom_call payloads:
        # serialized Mosaic bytecode WITH MLIR locations.  By default those
        # locations embed 10-frame Python tracebacks, so editing ANY file
        # on the trace path (driver, render, tests) shifts embedded line
        # numbers inside the payload and changes the persistent-cache key
        # of every kernel program — one silent ~5-minute remote recompile
        # per program per edit.  The outer module's debug info is stripped
        # before hashing (cache_key._canonicalize_ir), but the opaque
        # payload string is not.  Single-frame locations keep kernel-file
        # edits invalidating (correctly) while caller-file edits no longer
        # do.  Verified: a one-line shift in render.py changes the module
        # hash with tracebacks on, not with them off.
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
    except Exception:
        pass  # cache is an optimization, never a requirement
