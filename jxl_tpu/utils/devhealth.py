"""Device health probe: route around a wedged or degraded accelerator.

The tunneled TPU in this environment intermittently stalls for minutes
(BASELINE.md "tunnel transfer economics"); a decode that would win on a
healthy device loses badly — or hangs — through a wedged one. The first
device-path decision in a process kicks off a tiny round-trip probe and
answers from its result; if the probe times out or its latency exceeds
the threshold, every subsequent eligibility check prefers the host path
for the process lifetime.

The probe runs in a SUBPROCESS, not a thread: backend init is a C++
call that can block for minutes, and a daemon thread still inside that
call when the interpreter exits is killed by pthread forced-unwind —
which aborts the whole process ("FATAL: exception not rethrown"). A
child process is killable at any time and its teardown cannot corrupt
ours. When the platform is pinned to CPU (tests, dryrun_multichip) no
tunnel is involved and the probe answers inline without a child.

Override with JXL_TPU_DEVICE=on|off (on: trust the device uncondition-
ally; off: never dispatch device render work).
"""

from __future__ import annotations

import atexit
import os
import subprocess
import sys
import threading
import time

_latency: float | None = None
_lock = threading.Lock()
_proc: "subprocess.Popen | None" = None
_result: list = []  # [latency_seconds | None]
_grace_spent = False
_economics: dict = {}  # dispatch_s, up_mbps, down_mbps (post-init)

_CHILD_CODE = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
if jax.default_backend() == "cpu":
    import sys
    # inline backend: latency 0, bandwidths effectively infinite
    print(0.0, 0.0, 1e9, 1e9)
    sys.exit(0)
t0 = time.perf_counter()
x = jnp.ones((64, 64), jnp.float32)
y = (x + 1.0).block_until_ready()
np.asarray(y)
init_rt = time.perf_counter() - t0
# steady-state economics, measured POST-init (VERDICT r04 #10): the
# routing decision must key on what a decode actually pays per band —
# dispatch latency, upload bandwidth, readback bandwidth — not on the
# one-time backend/compile cost the old single round-trip conflated in.
f = jax.jit(lambda a: a + 1.0)
f(y).block_until_ready()
disp = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    f(y).block_until_ready()
    disp = min(disp, time.perf_counter() - t0)
big = np.zeros((4 << 20,), np.uint8)  # 4 MB each way
up = 1e9
t0 = time.perf_counter()
bd = jax.device_put(big)
bd.block_until_ready()
up = time.perf_counter() - t0
g = jax.jit(lambda a: a ^ 1)
out = g(bd).block_until_ready()
t0 = time.perf_counter()
np.asarray(out)
down = time.perf_counter() - t0
mb = big.nbytes / 1e6
print(init_rt, disp, mb / max(up, 1e-9), mb / max(down, 1e-9))
"""


def _cpu_pinned() -> bool:
    """True when this process cannot be talking to a tunnel: the JAX
    platform is pinned to CPU via env or (if jax is already imported)
    via jax.config. Reading config does not initialize a backend."""
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() in ("cpu", "cpu,"):
        return True
    jax_mod = sys.modules.get("jax")
    if jax_mod is not None:
        try:
            if (jax_mod.config.jax_platforms or "").strip().lower() == "cpu":
                return True
        except Exception:
            pass
    return False


def _kill_probe() -> None:
    p = _proc
    if p is not None and p.poll() is None:
        try:
            p.kill()
        except Exception:
            pass


def start_probe() -> None:
    """Kick off the round-trip probe (idempotent, non-blocking)."""
    global _proc
    with _lock:
        if _result or _proc is not None:
            return
        if _cpu_pinned():
            _result.append(0.0)
            return
        try:
            _proc = subprocess.Popen(
                [sys.executable, "-c", _CHILD_CODE],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                start_new_session=True,
            )
        except Exception:
            _result.append(None)
            return
        atexit.register(_kill_probe)


def _collect(timeout: float = 0.0) -> None:
    """Harvest the child's verdict if it has landed (optionally waiting
    up to `timeout`). The child writes one short line, far below the
    pipe buffer, so reading after exit cannot block."""
    p = _proc
    if p is None or _result:
        return
    if timeout > 0:
        try:
            p.wait(timeout)
        except subprocess.TimeoutExpired:
            pass
    if p.poll() is None:
        return
    val: float | None = None
    try:
        out = p.stdout.read() if p.stdout else b""
        if p.returncode == 0 and out:
            parts = [float(v) for v in out.split()]
            val = parts[0]
            if len(parts) >= 4:
                _economics.update(
                    dispatch_s=parts[1], up_mbps=parts[2], down_mbps=parts[3]
                )
    except Exception:
        val = None
    _result.append(val)


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
    global _latency, _grace_spent
    mode = os.environ.get("JXL_TPU_DEVICE", "auto")
    if mode in ("off", "host"):
        return False
    if mode in ("on", "device"):
        return True
    start_probe()
    with _lock:
        if not _result and not _grace_spent:
            # wait once per process; later calls while the probe is still
            # pending answer immediately (a decode may consult this dozens
            # of times — stacking 3 s waits would serialize the decode)
            _grace_spent = True
            _collect(grace)
        else:
            _collect()
        if not _result:
            return False  # pending — do not cache
        lat = _result[0]
        if lat is None or lat > max_latency:
            return False
        _latency = lat
        return True


def link_economics() -> dict | None:
    """Measured steady-state link numbers (dispatch seconds, upload and
    readback MB/s), or None while the probe is pending / failed. The
    values are post-init: backend bring-up and first-compile costs are
    excluded by construction (the child measures them after its warm-up
    round trip) — a slow one-time init therefore does NOT disqualify a
    link whose steady-state economics are healthy (the round-4 critique:
    routing must key on what a decode actually pays per byte)."""
    mode = os.environ.get("JXL_TPU_DEVICE", "auto")
    if mode in ("off", "host"):
        return None
    if mode in ("on", "device"):
        # forced: report ideal economics so cost models always route on
        return _economics or {"dispatch_s": 0.0, "up_mbps": 1e9, "down_mbps": 1e9}
    start_probe()
    with _lock:
        _collect()
    return _economics or None


def device_wins(up_bytes: int, down_bytes: int, host_seconds: float,
                dispatches: int = 8, duplex: float = 1.0) -> bool:
    """Cost-model router (VERDICT r04 #10): True when the device pipeline
    is predicted to beat the host path for a decode that must move
    `up_bytes` to the chip and `down_bytes` back, against a host estimate.

    The overlapped pipeline pays max(upload, readback) when the tunnel
    carries both directions concurrently (duplex=1.0) and their sum when
    it cannot; host entropy overlaps either way. A 1.25x safety margin
    biases toward the host — a misroute to a degraded tunnel costs far
    more than a missed device win."""
    eco = link_economics()
    if eco is None:
        return False
    up_t = up_bytes / 1e6 / max(eco["up_mbps"], 1e-6)
    down_t = down_bytes / 1e6 / max(eco["down_mbps"], 1e-6)
    link_t = max(up_t, down_t) + (1.0 - duplex) * min(up_t, down_t)
    predicted = dispatches * eco["dispatch_s"] + link_t
    return predicted * 1.25 < host_seconds


def device_fast(max_latency: float = 0.03) -> bool:
    """True when the device is DIRECT-ATTACH-class (round trip under
    `max_latency`), i.e. per-frame dispatch+readback genuinely beats the
    native host pipeline. A healthy-but-tunneled chip (45-115 ms per
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
