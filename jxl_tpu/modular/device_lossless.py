"""Device reconstruction lanes for channel-static lossless Modular.

The specialization lattice of the reference (frame/modular/decode/
specialized_trees.rs:413, flat_tree.rs:23-89) shows most lossless
corpus pixels flow through channel-split trees whose leaves are STATIC
simple predictors. Each such stream's entropy residuals can be emitted
raw by the native decoder (residual mode) and reconstructed by a
device lane chosen per channel:

- Zero: identity — the residuals ARE the pixels (the RLE/NoTreeZero
  fast-lossless backbone, SURVEY's named fast path).
- West: v[y][x] = v[y][x-1] + r, with v[y][0] = v[y-1][0] + r. Two
  cumsums: col0 = cumsum_y(r[:,0]); v = col0[:,None] + cumsum_x(r) -
  r[:,0:1]. int32 adds wrap identically on host (wrap_i32), numpy and
  XLA (two's complement), so this lane is bit-exact with NO magnitude
  gate — sum reassociation is exact mod 2^32.
- North: symmetric (row 0 is a West chain: top falls back to left at
  y == 0): row0 = cumsum_x(r[0]); v = row0[None,:] + cumsum_y(r) -
  r[0:1,:].
- Gradient: the clamp bounds track the running value, so this is not a
  prefix sum; the honest device shape is WAVEFRONT parallelism — every
  anti-diagonal d depends only on d-1 and d-2, all its cells in
  parallel. In skewed coordinates S[d, x] = V[d-x, x] the neighbors are
  pure vector shifts, so one `lax.scan` over diagonals with a
  (lanes, W) carry reconstructs LANES channels at once.

Split of labor: the host C++ entropy loop emits raw signed residuals
(native flag bit 0 — pure entropy, no prediction), batches of lanes
upload (int16 wire when the range allows), and the device programs run
ASYNC while host entropy continues on later sections — the same
entropy‖compute overlap as the VarDCT band pipeline (api/overlap.py).

Exactness (gradient lane): by induction along diagonals the running
bound grows by at most max|r| per diagonal, so with the dynamic gate
3 * (H + W - 1) * max|r| < 2^31 the int32 l + t - tl never overflows
and the device arithmetic is bit-identical to the C++ loop (tested
corpus-wide). Out-of-range lanes and any device failure fall back to
the native in-place reconstruction (jxl_gradient_reconstruct).
"""

from __future__ import annotations

import os
import threading

import numpy as np

MAX_DIM = 2048
MIN_STREAM_PX = 2048  # tiny streams decode faster fully on host
MAX_CHUNK_BYTES = 128 << 20  # lanes per dispatch scale down for big dims

_PRED_ZERO, _PRED_WEST, _PRED_NORTH, _PRED_GRADIENT = 0, 1, 2, 5

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


def _chunk_lanes(H: int, W: int) -> int:
    """Lanes per async dispatch, memory-capped for large channels."""
    per_lane = H * W * 4
    return max(8, min(128, MAX_CHUNK_BYTES // max(per_lane, 1)))


def _program(kind: int, L: int, H: int, W: int, wire_dtype: str, mesh=None):
    """Jitted reconstruction: (L, H, W) residuals -> pixels.

    kind selects the lane: West/North cumsum or the gradient wavefront.
    With `mesh` (a 1-axis jax.sharding.Mesh), lanes shard across devices
    — every lane is independent, so the pod-scale program runs with zero
    collectives (each chip reconstructs its own lane slice)."""
    import jax
    import jax.numpy as jnp

    key = (kind, L, H, W, wire_dtype,
           None if mesh is None else tuple(mesh.shape.items()))
    fn = _CACHE.get(key)
    if fn is not None:
        return fn

    D = H + W - 1

    def cumsum_west(r):
        r = r.astype(jnp.int32)
        col0 = jnp.cumsum(r[:, :, 0], axis=1)
        return col0[:, :, None] + jnp.cumsum(r, axis=2) - r[:, :, 0:1]

    def cumsum_north(r):
        r = r.astype(jnp.int32)
        row0 = jnp.cumsum(r[:, 0, :], axis=1)
        return row0[:, None, :] + jnp.cumsum(r, axis=1) - r[:, 0:1, :]

    def wavefront(r):
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

    program = {
        _PRED_WEST: cumsum_west,
        _PRED_NORTH: cumsum_north,
        _PRED_GRADIENT: wavefront,
    }[kind]

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
    """Collects residual-decoded channel-static streams and reconstructs
    them in batched async device dispatches; flush() writes pixels back
    into the submitted channel views."""

    def __init__(self):
        self._lock = threading.Lock()
        # (kind, Hpow2, Wpow2) -> list of target channel views
        self._buckets: dict = {}
        self._inflight: list = []  # (device_array, targets)
        self.lanes_device = 0
        self.lanes_host = 0
        self.lanes_identity = 0  # Zero-predictor: residuals ARE pixels
        # pixel tallies for the corpus eligibility report (VERDICT r04 #3)
        self.px_device = 0
        self.px_identity = 0
        self.px_host = 0
        self.px_ineligible = 0  # streams the lanes cannot take (WP etc.)

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
        if not tree.is_channel_static:
            return False
        live = [
            (ci, b) for ci, b in enumerate(local_buffers) if b.data.size > 0
        ]
        if not live:
            return False
        if any(b.data.shape[0] > MAX_DIM or b.data.shape[1] > MAX_DIM
               for _, b in live):
            return False
        if sum(b.data.size for _, b in live) < MIN_STREAM_PX:
            return False
        if not native.available():
            return False

        preds = [tree.leaf_predictor_for_channel(ci) for ci, _ in live]

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
                done = {ci: p for (ci, _), p in zip(live, preds)}
                for ci, b in enumerate(local_buffers[: partial_out[0]]):
                    if b.data.size:
                        _reconstruct_host(b.data, done.get(ci, _PRED_GRADIENT))
            raise
        if not ok:
            return False

        with self._lock:
            for (ci, b), pred in zip(live, preds):
                if pred == _PRED_ZERO:
                    self.lanes_identity += 1  # residuals are the pixels
                    self.px_identity += b.data.size
                    continue
                h, w = b.data.shape
                if pred == _PRED_GRADIENT:
                    # dynamic int32-overflow gate (see module docstring)
                    amax = int(np.abs(b.data).max(initial=0))
                    if amax >= (1 << 31) // (3 * (h + w - 1)):
                        _reconstruct_host(b.data, pred)
                        self.lanes_host += 1
                        self.px_host += b.data.size
                        continue
                self.px_device += b.data.size
                bucket = (pred, _pow2ceil(h), _pow2ceil(w))
                pend = self._buckets.setdefault(bucket, [])
                pend.append(b)
                if len(pend) >= _chunk_lanes(bucket[1], bucket[2]):
                    self._dispatch(bucket, pend)
                    self._buckets[bucket] = []
        return True

    # -- device dispatch -----------------------------------------------

    def _dispatch(self, bucket, pend) -> None:
        kind, H, W = bucket
        L = _pow2ceil(len(pend), lo=8)
        amax = max(int(np.abs(b.data).max(initial=0)) for b in pend)
        wire = np.int16 if amax < 32768 else np.int32
        batch = np.zeros((L, H, W), dtype=wire)
        for i, b in enumerate(pend):
            h, w = b.data.shape
            batch[i, :h, :w] = b.data
        try:
            import jax

            fn = _program(kind, L, H, W, wire().dtype.name)
            dev = fn(jax.device_put(batch))  # async
        except Exception:
            for b in pend:
                _reconstruct_host(b.data, kind)
            self.lanes_host += len(pend)
            return
        self._inflight.append((dev, list(pend), kind))
        self.lanes_device += len(pend)

    def flush(self) -> None:
        """Dispatch remainders, wait for all device chunks, write pixels
        back into every submitted channel view. Host fallback on any
        device failure."""
        with self._lock:
            for bucket, pend in list(self._buckets.items()):
                if pend:
                    self._dispatch(bucket, pend)
            self._buckets.clear()
            inflight, self._inflight = self._inflight, []
        for dev, targets, kind in inflight:
            try:
                host = np.asarray(dev)
            except Exception:
                for b in targets:
                    _reconstruct_host(b.data, kind)
                self.lanes_host += len(targets)
                self.lanes_device -= len(targets)
                continue
            for i, b in enumerate(targets):
                h, w = b.data.shape
                b.data[...] = host[i, :h, :w]
        from ..utils import trace

        if self.lanes_device:
            trace.metrics.add("lossless_device_lanes", self.lanes_device)
        if self.lanes_identity:
            trace.metrics.add("lossless_identity_lanes", self.lanes_identity)
        if self.lanes_host:
            trace.metrics.add("lossless_host_lanes", self.lanes_host)
        for name in ("px_device", "px_identity", "px_host", "px_ineligible"):
            v = getattr(self, name)
            if v:
                trace.metrics.add(f"lossless_{name}", v)


def _reconstruct_host(data: np.ndarray, pred: int) -> None:
    """In-place host reconstruction of raw residuals for one channel."""
    if pred == _PRED_ZERO:
        return
    if pred == _PRED_WEST:
        col0 = np.cumsum(data[:, 0], dtype=np.int32)
        r0 = data[:, 0].copy()
        data[...] = np.cumsum(data, axis=1, dtype=np.int32)
        data += (col0 - r0)[:, None]
        return
    if pred == _PRED_NORTH:
        row0 = np.cumsum(data[0], dtype=np.int32)
        r0 = data[0].copy()
        data[...] = np.cumsum(data, axis=0, dtype=np.int32)
        data += (row0 - r0)[None, :]
        return
    from .. import native

    native.gradient_reconstruct(data)


def maybe_submit(local_buffers, tree, header, transform_steps, br,
                 stream_id, image_width, partial_out) -> bool:
    """Module-level hook for decode_modular_subbitstream."""
    ctx = _active
    if ctx is None:
        return False
    taken = ctx.submit(local_buffers, tree, header, transform_steps, br,
                       stream_id, image_width, partial_out)
    if not taken:
        # stream shape the lanes cannot take (WP/context trees, local
        # transforms, oversize dims, tiny streams): host decodes it
        ctx.px_ineligible += sum(b.data.size for b in local_buffers)
    return taken


def enabled() -> bool:
    mode = os.environ.get("JXL_TPU_DEV_LOSSLESS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    from ..utils.devhealth import device_fast

    return device_fast()
