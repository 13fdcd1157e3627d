"""Device-backend availability hardening.

The TPU here is reached through a remote tunnel whose worker can restart
or drop out for minutes at a time; when it does, the FIRST `jax.devices()`
call blocks for the transport's own connect timeout and then raises
`RuntimeError: Unable to initialize backend ... UNAVAILABLE`.  jax caches
that failure, so a plain retry re-raises instantly.  Benchmarks and
hardware checks are long-lived batch jobs — a transient outage at their
start should wait it out, not erase the run's evidence.
"""

from __future__ import annotations

import time
from typing import Callable


def wait_for_device(max_wait_s: float = 1200.0, retry_delay_s: float = 30.0,
                    log: Callable[[str], None] = print):
    """Return `jax.devices()`, retrying backend init until it succeeds.

    Each failed attempt clears jax's memoized backend-error state so the
    next attempt re-runs platform initialization (otherwise the cached
    RuntimeError re-raises without touching the transport).  Raises the
    last error once `max_wait_s` has elapsed.  A successful first call
    (the common case) returns immediately with no side effects.
    """
    import jax

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            return jax.devices()
        except RuntimeError as e:
            if time.monotonic() >= deadline:
                raise
            log(f"device init attempt {attempt} failed ({e}); "
                f"retrying in {retry_delay_s:.0f}s")
            try:
                from jax._src import xla_bridge as xb

                xb._clear_backends()
            except Exception:
                pass  # best effort: newer jax may rename the private hook
            time.sleep(retry_delay_s)
