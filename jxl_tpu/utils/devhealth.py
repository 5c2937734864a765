"""Device health probe: route around a wedged or degraded accelerator.

The tunneled TPU in this environment intermittently stalls for minutes
(BASELINE.md "tunnel transfer economics"); a decode that would win on a
healthy device loses badly — or hangs — through a wedged one. The first
device-path decision in a process runs a tiny round-trip probe in a
daemon thread with a hard wall-clock budget; if the probe times out or
its latency exceeds the threshold, every subsequent eligibility check
prefers the host path for the process lifetime.

Override with JXL_TPU_DEVICE=on|off (on: trust the device uncondition-
ally; off: never dispatch device render work).
"""

from __future__ import annotations

import os
import threading
import time

_status: bool | None = None
_latency: float | None = None
_lock = threading.Lock()
_thread: threading.Thread | None = None
_result: list = []
_grace_spent = False


def _probe(result: list) -> None:
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        # backend init itself is the first thing that hangs on a wedged
        # tunnel — it MUST run inside this budgeted thread, never on the
        # caller's thread
        if jax.default_backend() == "cpu":
            # virtual CPU devices (tests / dryrun): no tunnel involved
            result.append(0.0)
            return
        t0 = time.perf_counter()
        x = jnp.ones((64, 64), jnp.float32)
        y = (x + 1.0).block_until_ready()
        np.asarray(y)
        result.append(time.perf_counter() - t0)
    except Exception:
        result.append(None)


def start_probe() -> None:
    """Kick off the round-trip probe in a daemon thread (idempotent)."""
    global _thread
    with _lock:
        if _thread is None:
            _thread = threading.Thread(target=_probe, args=(_result,), daemon=True)
            _thread.start()


def device_ok(max_latency: float = 2.0, grace: float = 3.0) -> bool:
    """True when device render dispatch is worth it right now.

    Non-blocking beyond `grace`: a wedged tunnel (backend init alone can
    stall for minutes) must not serialize the first decode in a process.
    While the probe is still pending we answer False — the host path is
    the correct route for a tunnel that slow anyway — WITHOUT caching the
    verdict; a later call after the probe lands returns the real answer,
    so a healthy-but-slow-to-init device is only misrouted for the decode
    that raced its init.
    """
    global _status, _latency
    mode = os.environ.get("JXL_TPU_DEVICE", "auto")
    if mode in ("off", "host"):
        return False
    if mode in ("on", "device"):
        return True
    if _status is not None:
        return _status
    start_probe()
    global _grace_spent
    if not _grace_spent:
        # wait once per process; later calls while the probe is still
        # pending answer immediately (a decode may consult this dozens of
        # times — stacking 3 s joins would serialize the whole decode)
        _grace_spent = True
        _thread.join(grace)
    with _lock:
        if _status is not None:
            return _status
        if not _result:
            return False  # pending — do not cache
        if _result[0] is None or _result[0] > max_latency:
            _status = False
        else:
            _status = True
            _latency = _result[0]
        return _status


def device_fast(max_latency: float = 0.03) -> bool:
    """True when the device is DIRECT-ATTACH-class (round trip under
    `max_latency`), i.e. per-frame dispatch+readback genuinely beats the
    native host pipeline. A healthy-but-tunneled chip (60-115 ms per
    computed readback, BASELINE.md) passes device_ok() yet loses to the
    ~190 ms/MP host photo path — whole-image device render and the
    overlapped banded path only pay off below tunnel-class latency.
    JXL_TPU_DEVICE=on forces True; virtual CPU meshes probe at ~0 and
    stay on the device path (tests exercise the device programs)."""
    mode = os.environ.get("JXL_TPU_DEVICE", "auto")
    if mode in ("on", "device"):
        return True
    if not device_ok():
        return False
    return _latency is not None and _latency <= max_latency
