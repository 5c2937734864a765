"""Group-sharded render pipeline over a TPU mesh with ICI halo exchange.

The TPU analog of the reference's low-memory pipeline (ref
render/low_memory_pipeline/): groups are shards, the topbottom/leftright
halo buffers become one `ppermute` neighbor exchange, and the 3x3
readiness mask disappears because all groups of a frame render in
lockstep. Border pixels are rendered redundantly on both shards (exactly
like the reference re-renders borders), so the sharded output is
bit-identical to the whole-image oracle by construction.

MAX_BORDER (9 = gaborish 1 + EPF 3+2+1 + upsample 2) bounds the halo,
mirroring ref render/mod.rs:29-37.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.device_render import RenderParams, render_block

MAX_BORDER = 9
SIGMA_BORDER = 2  # ceil(MAX_BORDER / 8) blocks


def exchange_halo_rows(x, halo: int, axis: str):
    """Extend a row-sharded block with `halo` rows from each neighbor shard.

    Edge shards receive mirrored padding (matching whole-image borders).
    x: (rows, cols) local shard. Returns (rows + 2*halo, cols).
    """
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    # send bottom rows downward (to i+1), top rows upward (to i-1)
    from_above = jax.lax.ppermute(
        x[-halo:, :], axis, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_below = jax.lax.ppermute(
        x[:halo, :], axis, perm=[(i + 1, i) for i in range(n - 1)]
    )
    # mirror padding at the image edges (ref util/mirror.rs semantics)
    mirror_top = x[:halo, :][::-1, :]
    mirror_bottom = x[-halo:, :][::-1, :]
    top = jnp.where(idx == 0, mirror_top, from_above)
    bottom = jnp.where(idx == n - 1, mirror_bottom, from_below)
    return jnp.concatenate([top, x, bottom], axis=0)


def sharded_render(mesh: Mesh, params: RenderParams, image_rows: int, image_cols: int):
    """Build the jitted multi-chip render step.

    Planes are sharded by row-bands of groups over the 'groups' mesh axis.
    Each shard extends itself by MAX_BORDER halo rows via ppermute, runs
    the full stage bundle locally, and crops — border pixels are computed
    redundantly so results are bit-identical to the unsharded program.
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    assert image_rows % (n * 8) == 0, "rows must split into whole blocks per shard"
    shard_rows = image_rows // n

    def local_fn(planes, sigma):
        # planes: (3, shard_rows, cols); sigma: (shard_rows//8, cols//8)
        ext = jnp.stack(
            [exchange_halo_rows(planes[c], MAX_BORDER, axis) for c in range(3)]
        )
        sig_ext = exchange_halo_rows(sigma, SIGMA_BORDER, axis)
        # position of the extended block in sigma-block coordinates: the
        # halo offset shifts the 8x8 block phase for EPF's border sad_mul.
        pos = (0, 8 * SIGMA_BORDER - MAX_BORDER)
        out = render_block(ext, sig_ext, params, pos=pos)
        return out[:, MAX_BORDER:-MAX_BORDER, :]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
    )
    return jax.jit(fn)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("groups",))


# -- production sharded program ---------------------------------------------------

HALO = 8  # filter border 7 (gaborish+EPF) + 1 row of stage-remirror margin


def sharded_filters_and_color(mesh: Mesh, frame, rows: int, cols: int,
                              out_format: str = "f32"):
    """Build the jitted PRODUCTION multi-chip render step for `frame`:
    row-band shards, one ppermute halo exchange, then the same filter
    chain + color transform (+ output conversion) as the single-chip
    fused program (render/device_filters.py). Border pixels are computed
    redundantly on both shards so the result matches the whole-image
    program on the interior.

    rows must be divisible by n_devices and the per-shard rows by 8 (to
    keep the EPF 8x8-block sad_mul phase aligned without threading pos).
    """
    from ..render import device_filters as df
    from ..render import simple as render_simple
    from ..render.stages import core as st

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    assert rows % n == 0 and (rows // n) % 8 == 0, (rows, n)
    shard_rows = rows // n

    rf = frame.header.restoration_filter
    gab_weights = df._gab_key(rf)
    epf_iters = int(rf.epf_iters)
    rfk = df._rf_key(rf)
    rf_obj = df._Rf()
    rf_obj.epf_channel_scale = list(rfk[0])
    rf_obj.epf_pass0_sigma_scale = rfk[1]
    rf_obj.epf_pass2_sigma_scale = rfk[2]
    rf_obj.epf_border_sad_mul = rfk[3]
    rf_obj.epf_sharp_lut = None

    def local_fn(planes, sigma_px):
        # planes: (3, shard_rows, cols); sigma_px: (shard_rows, cols)
        chans = [planes[0], planes[1], planes[2]]
        if gab_weights is not None or epf_iters > 0:
            chans = [exchange_halo_rows(c, HALO, axis) for c in chans]
            sig = exchange_halo_rows(sigma_px, HALO, axis)
            # force the stage-math path: the pallas kernel pads its own
            # halo and would double-count the exchanged one
            if gab_weights is not None:
                chans = [
                    st.gaborish(jnp, c, w1, w2)
                    for c, (w1, w2) in zip(chans, gab_weights)
                ]
            if epf_iters >= 3:
                chans = st.epf_step_px(jnp, chans, sig, rf_obj, 0)
            if epf_iters >= 1:
                chans = st.epf_step_px(jnp, chans, sig, rf_obj, 1)
            if epf_iters >= 2:
                chans = st.epf_step_px(jnp, chans, sig, rf_obj, 2)
            chans = [c[HALO:-HALO, :] for c in chans]
        chans = render_simple.color_transform(frame, chans, xp=jnp)
        if out_format != "f32":
            y0 = jax.lax.axis_index(axis) * shard_rows
            chans = [
                st.convert_output(jnp, c, out_format, channel=i)
                if out_format != "u8"
                else st.f32_to_u8(jnp, c, 8, i, pos=(0, y0))
                for i, c in enumerate(chans)
            ]
        return jnp.stack(chans)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
    )
    return jax.jit(fn)
