"""Device wavefront reconstruction for gradient-only lossless Modular.

The fast-lossless shape (channel-split trees with pure-gradient leaves,
ref frame/modular/decode/specialized_trees.rs:413 lattice, flat_tree.rs)
dominates lossless corpus pixels. Its row recurrence

    v[y][x] = clamp(l + t - tl, min(l, t), max(l, t)) + r[y][x]

is not a prefix sum (the clamp bounds track the running value), so the
honest device shape is WAVEFRONT parallelism: every anti-diagonal d of a
channel depends only on diagonals d-1 and d-2, all its cells in
parallel. In skewed coordinates S[d, x] = V[d-x, x] the neighbors are
pure vector shifts:

    t  = S[d-1, x]      l = S[d-1, x-1]      tl = S[d-2, x-1]

so one `lax.scan` over diagonals with a (lanes, W) carry reconstructs
LANES channels at once — lanes are group-channel streams batched across
the whole frame (pod-lane counts for large images: a 28 MP image yields
~500 256x256 lanes).

Split of labor: the host C++ entropy loop emits raw signed residuals
(native flag bit 0 — pure entropy, no prediction), batches of lanes
upload (int16 wire when the range allows), and the device scan runs
ASYNC while host entropy continues on later sections — the same
entropy‖compute overlap as the VarDCT band pipeline (api/overlap.py).

Exactness: residual magnitudes are gated host-side at < 2^19 with
channel dims <= 512. By induction the running max grows by at most
max|r| per diagonal, so values stay below 1023*2^19 < 2^29 and the
int32 l + t - tl stays below 3*2^29 < 2^31: no overflow, and the device
arithmetic is bit-identical to the C++ loop (tested corpus-wide).
Out-of-range lanes and any device failure fall back to the native
in-place reconstruction (jxl_gradient_reconstruct).
"""

from __future__ import annotations

import os
import threading

import numpy as np

MAX_DIM = 512
MAX_RESIDUAL = 1 << 19  # |values| < 1023 * 2^19 < 2^29: int32-safe
MIN_STREAM_PX = 2048  # tiny streams decode faster fully on host
CHUNK_LANES = 128  # lanes per async device dispatch

_active = None
_CACHE: dict = {}


class _Activation:
    def __init__(self, ctx):
        self.ctx = ctx

    def __enter__(self):
        global _active
        self._prev = _active
        _active = self.ctx
        return self.ctx

    def __exit__(self, *exc):
        global _active
        _active = self._prev
        return False


def activate(ctx: "BatchContext") -> _Activation:
    """Route eligible modular sub-bitstreams through `ctx` within the
    `with` body (decode_modular_subbitstream consults the active
    context). Call ctx.flush() after the body, before run_transforms."""
    return _Activation(ctx)


def _pow2ceil(n: int, lo: int = 32) -> int:
    v = lo
    while v < n:
        v <<= 1
    return v


def _program(L: int, H: int, W: int, wire_dtype: str, mesh=None):
    """Jitted wavefront reconstruction: (L, H, W) residuals -> pixels.

    With `mesh` (a 1-axis jax.sharding.Mesh), lanes shard across devices
    — the scan is elementwise over lanes, so the pod-scale program runs
    with zero collectives (each chip reconstructs its own lane slice)."""
    import jax
    import jax.numpy as jnp

    key = (L, H, W, wire_dtype, None if mesh is None else tuple(mesh.shape.items()))
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    D = H + W - 1

    def program(r):
        r = r.astype(jnp.int32)
        x_idx = jnp.arange(W, dtype=jnp.int32)
        d_arr = jnp.arange(D, dtype=jnp.int32)
        # skew to S[d, l, x] = r[l, d-x, x] (zeros outside the channel)
        Y = d_arr[:, None] - x_idx[None, :]  # (D, W)
        sk = r[:, jnp.clip(Y, 0, H - 1), x_idx[None, :]]
        sk = jnp.where(((Y >= 0) & (Y < H))[None], sk, 0)
        sk = jnp.moveaxis(sk, 0, 1)  # (D, L, W)
        first_col = (x_idx == 0)[None, :]

        def step(carry, xs):
            p1, p2 = carry
            r_d, d = xs
            first_row = x_idx[None, :] == d  # cell (d, x) has y == 0
            t = jnp.where(first_row, 0, p1)
            l = jnp.where(first_col, t, jnp.roll(p1, 1, axis=1))
            tl = jnp.where(first_row, 0, jnp.roll(p2, 1, axis=1))
            tl = jnp.where(first_col, t, tl)
            pred = jnp.clip(l + t - tl, jnp.minimum(l, t), jnp.maximum(l, t))
            v = pred + r_d
            return (v, p1), v

        z = jnp.zeros((r.shape[0], W), jnp.int32)
        _, ys = jax.lax.scan(step, (z, z), (sk, d_arr))
        # unskew: V[l, y, x] = S[y+x, l, x]
        st = jnp.moveaxis(ys, 0, 1)  # (L, D, W)
        idx = jnp.arange(H, dtype=jnp.int32)[:, None] + x_idx[None, :]
        return jnp.take_along_axis(st, idx[None, :, :], axis=1)

    if mesh is None:
        fn = jax.jit(program)
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = tuple(mesh.shape)[0]
        lanes = NamedSharding(mesh, PartitionSpec(axis, None, None))
        fn = jax.jit(program, in_shardings=lanes, out_shardings=lanes)
    _CACHE[key] = fn
    return fn


class BatchContext:
    """Collects residual-decoded gradient-only streams and reconstructs
    them in batched async device dispatches; flush() writes pixels back
    into the submitted channel views."""

    def __init__(self):
        self._lock = threading.Lock()
        self._buckets: dict = {}  # (H, W) -> list of (target_view, residuals)
        self._inflight: list = []  # (device_array, targets, dims)
        self.lanes_device = 0
        self.lanes_host = 0

    # -- submission (called from decode_modular_subbitstream) ----------

    def submit(self, local_buffers, tree, header, transform_steps, br,
               stream_id, image_width, partial_out) -> bool:
        """Residual-decode one eligible stream and enqueue its channels.
        Returns False (caller decodes normally) when ineligible; raises
        bitstream errors exactly like the normal path."""
        from .. import native
        from ..errors import JxlError

        if transform_steps:
            return False
        if not tree.is_gradient_only:
            return False
        live = [b for b in local_buffers if b.data.size > 0]
        if not live:
            return False
        if any(b.data.shape[0] > MAX_DIM or b.data.shape[1] > MAX_DIM
               for b in live):
            return False
        if sum(b.data.size for b in live) < MIN_STREAM_PX:
            return False
        if not native.available():
            return False

        try:
            ok = native.decode_modular_native(
                local_buffers, stream_id, header, tree, br, image_width,
                partial_out, residuals=True,
            )
        except JxlError:
            # partial channels hold residuals; reconstruct them so the
            # caller's partial-render semantics see pixels (bit-exact:
            # safe channels' residuals are complete)
            if partial_out is not None:
                for b in local_buffers[: partial_out[0]]:
                    if b.data.size:
                        native.gradient_reconstruct(b.data)
            raise
        if not ok:
            return False

        with self._lock:
            for b in live:
                h, w = b.data.shape
                res = b.data
                if int(np.abs(res).max(initial=0)) >= MAX_RESIDUAL:
                    native.gradient_reconstruct(res)
                    self.lanes_host += 1
                    continue
                bucket = (_pow2ceil(h), _pow2ceil(w))
                pend = self._buckets.setdefault(bucket, [])
                pend.append(b)
                if len(pend) >= CHUNK_LANES:
                    self._dispatch(bucket, pend)
                    self._buckets[bucket] = []
        return True

    # -- device dispatch -----------------------------------------------

    def _dispatch(self, bucket, pend) -> None:
        H, W = bucket
        L = _pow2ceil(len(pend), lo=8)
        amax = max(int(np.abs(b.data).max(initial=0)) for b in pend)
        wire = np.int16 if amax < 32768 else np.int32
        batch = np.zeros((L, H, W), dtype=wire)
        for i, b in enumerate(pend):
            h, w = b.data.shape
            batch[i, :h, :w] = b.data
        try:
            import jax

            fn = _program(L, H, W, wire().dtype.name)
            dev = fn(jax.device_put(batch))  # async
        except Exception:
            for b in pend:
                from .. import native

                native.gradient_reconstruct(b.data)
            self.lanes_host += len(pend)
            return
        self._inflight.append((dev, list(pend)))
        self.lanes_device += len(pend)

    def flush(self) -> None:
        """Dispatch remainders, wait for all device chunks, write pixels
        back into every submitted channel view. Host fallback on any
        device failure."""
        from .. import native

        with self._lock:
            for bucket, pend in list(self._buckets.items()):
                if pend:
                    self._dispatch(bucket, pend)
            self._buckets.clear()
            inflight, self._inflight = self._inflight, []
        for dev, targets in inflight:
            try:
                host = np.asarray(dev)
            except Exception:
                for b in targets:
                    native.gradient_reconstruct(b.data)
                self.lanes_host += len(targets)
                self.lanes_device -= len(targets)
                continue
            for i, b in enumerate(targets):
                h, w = b.data.shape
                b.data[...] = host[i, :h, :w]
        from ..utils import trace

        if self.lanes_device:
            trace.metrics.add("lossless_device_lanes", self.lanes_device)
        if self.lanes_host:
            trace.metrics.add("lossless_host_lanes", self.lanes_host)


def maybe_submit(local_buffers, tree, header, transform_steps, br,
                 stream_id, image_width, partial_out) -> bool:
    """Module-level hook for decode_modular_subbitstream."""
    ctx = _active
    if ctx is None:
        return False
    return ctx.submit(local_buffers, tree, header, transform_steps, br,
                      stream_id, image_width, partial_out)


def enabled() -> bool:
    mode = os.environ.get("JXL_TPU_DEV_LOSSLESS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    from ..utils.devhealth import device_fast

    return device_fast()
