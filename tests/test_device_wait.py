"""wait_for_device: transient backend outages are retried, not fatal."""

import pytest

from raytracer_tpu.utils.device import wait_for_device


def test_returns_devices_immediately_when_up():
    import jax

    assert wait_for_device(max_wait_s=5) == jax.devices()


def _stub_clear_backends(monkeypatch):
    # wait_for_device clears jax's memoized backend state between attempts;
    # doing that FOR REAL here would invalidate device arrays cached by
    # other tests in this worker process (e.g. render._CLIPS_CACHE), an
    # ordering-dependent flake — the clearing itself is exercised live by
    # the supervisor/bench on the real tunnel, not simulated here
    from jax._src import xla_bridge as xb

    monkeypatch.setattr(xb, "_clear_backends", lambda: None)


def test_retries_until_backend_succeeds(monkeypatch):
    import jax

    _stub_clear_backends(monkeypatch)
    real = jax.devices()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon': "
                               "UNAVAILABLE: TPU backend setup error")
        return real

    monkeypatch.setattr(jax, "devices", flaky)
    out = wait_for_device(max_wait_s=30, retry_delay_s=0.01,
                          log=lambda m: None)
    assert out == real and calls["n"] == 3


def test_raises_after_deadline(monkeypatch):
    import jax

    _stub_clear_backends(monkeypatch)

    def down():
        raise RuntimeError("UNAVAILABLE")

    monkeypatch.setattr(jax, "devices", down)
    with pytest.raises(RuntimeError):
        wait_for_device(max_wait_s=0.05, retry_delay_s=0.01,
                        log=lambda m: None)
