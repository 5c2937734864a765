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


def make_mesh_2d(n_devices: int | None = None) -> Mesh:
    """2-D (group-row, group-col) mesh — the full-frame sharding shape
    (SURVEY §2.2 item 1: shard groups across chips on both axes)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    gy = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            gy = cand
            break
    return Mesh(np.array(devs).reshape(gy, n // gy), ("gy", "gx"))


def exchange_halo_cols(x, halo: int, axis: str):
    """Column analog of exchange_halo_rows: extend (rows, cols) by `halo`
    columns from the left/right neighbor shards (mirror at image edges)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    from_left = jax.lax.ppermute(
        x[:, -halo:], axis, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        x[:, :halo], axis, perm=[(i + 1, i) for i in range(n - 1)]
    )
    mirror_l = x[:, :halo][:, ::-1]
    mirror_r = x[:, -halo:][:, ::-1]
    left = jnp.where(idx == 0, mirror_l, from_left)
    right = jnp.where(idx == n - 1, mirror_r, from_right)
    return jnp.concatenate([left, x, right], axis=1)


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


# -- full-frame sharded VarDCT: coefficients -> IDCT -> filters -> color ------
#
# VERDICT/SURVEY north star: the whole numeric decode path (dequant + CfL +
# inverse transforms), not just the filters, runs under one 2-D group mesh.
# Each shard owns a rectangle of whole 256px groups: it scatters its own
# blocks (host-prepared per-shard index tables), IDCTs them into its local
# band, then a two-step (rows, cols) ppermute halo exchange feeds the
# filter + color chain. Border pixels are computed redundantly, so the
# result is identical to the single-chip whole-frame program.

GROUP_PX = 256


def sharded_vardct_frame(mesh: Mesh, frame, coeffs_by_group: dict,
                         out_format: str = "f32"):
    """Run coefficients -> pixels -> filters -> color over a 2-D mesh.

    Returns the assembled (3, H, W) numpy output (cropped to block dims).
    Requires a 444 frame whose padded size splits into whole groups per
    shard along each mesh axis (pad rows/cols of groups are fine)."""
    from ..render import device_filters as df
    from ..render import simple as render_simple
    from ..render.stages import core as st
    from ..vardct.device_frame import _GROUP_STRIDE
    from ..vardct.group import _BlockList, BLOCK_SIZE
    from ..vardct.transforms_batch import transform_to_pixels_batch
    from ..vardct.cfl import COLOR_TILE_DIM_IN_BLOCKS

    header = frame.header
    assert header.is444
    hf = frame.hf_meta
    lf_global = frame.lf_global
    ccp = lf_global.color_correlation_params
    qp = lf_global.quant_params
    dqm = frame.hf_global.dequant_matrices
    biases = np.asarray(
        frame.file_header.transform_data.opsin_inverse_matrix.quant_biases,
        dtype=np.float32,
    )
    x_dm = np.float32((1.0 / 1.25) ** (header.x_qm_scale - 2.0))
    b_dm = np.float32((1.0 / 1.25) ** (header.b_qm_scale - 2.0))
    bw, bh = header.size_blocks()
    gw_groups, gh_groups = header.size_groups()
    ngy, ngx = mesh.devices.shape
    # pad the group grid so it tiles the mesh exactly
    GY = -(-gh_groups // ngy) * ngy
    GX = -(-gw_groups // ngx) * ngx
    sgy, sgx = GY // ngy, GX // ngx      # groups per shard (rows, cols)
    sh_blk, sw_blk = sgy * 32, sgx * 32  # blocks per shard
    sh_px, sw_px = sh_blk * 8, sw_blk * 8

    # ---- host prep: per-shard, per-tid block tables (O(G)) ---------------
    # Coefficients are SHARDED: each shard holds only its own groups'
    # buffers at slot (local_gy * sgx + local_gx) * _GROUP_STRIDE, so the
    # one array that grows with image size is distributed, not broadcast
    # (VERDICT #7; group ownership per ref group_scheduler.rs:100-180).
    shards = {}  # (sy, sx) -> {tid: [local_bx, local_by, local_coeff_off]}
    tids_all = set()
    group_ids = sorted(coeffs_by_group)
    for g in group_ids:
        gy, gx = g // gw_groups, g % gw_groups
        sy, sx = gy // sgy, gx // sgx
        bl = _BlockList(frame, g)
        rec = shards.setdefault((sy, sx), {})
        slot = (gy % sgy) * sgx + (gx % sgx)
        base = slot * _GROUP_STRIDE
        lbx = bl.bxs + (gx % sgx) * 32
        lby = bl.bys + (gy % sgy) * 32
        for t in np.unique(bl.tids).tolist():
            m = bl.tids == t
            tids_all.add(int(t))
            rec.setdefault(int(t), []).append(
                (lbx[m], lby[m], base + bl.offs[m])
            )
    tids = tuple(sorted(tids_all))
    from ..vardct.transform_map import covered_blocks_x, covered_blocks_y

    ncs = {t: covered_blocks_x(t) * covered_blocks_y(t) * BLOCK_SIZE for t in tids}
    mats = {
        t: np.stack(
            [np.asarray(dqm.matrix(t, c)[: ncs[t]], np.float32) for c in range(3)]
        )
        for t in tids
    }
    # pad per-tid counts to the max across shards (lockstep SPMD shapes)
    idx_in = {}
    for t in tids:
        counts = [
            sum(len(a[0]) for a in shards.get((sy, sx), {}).get(t, []))
            for sy in range(ngy)
            for sx in range(ngx)
        ]
        pad = 1 << max(2, (max(counts + [1]) - 1).bit_length())
        bxa = np.zeros((ngy, ngx, pad), np.int32)
        bya = np.zeros((ngy, ngx, pad), np.int32)
        offa = np.full((ngy, ngx, pad), -1, np.int32)  # -1 -> masked out
        for sy in range(ngy):
            for sx in range(ngx):
                parts = shards.get((sy, sx), {}).get(t, [])
                if not parts:
                    continue
                bx = np.concatenate([p[0] for p in parts])
                by = np.concatenate([p[1] for p in parts])
                off = np.concatenate([p[2] for p in parts])
                bxa[sy, sx, : len(bx)] = bx
                bya[sy, sx, : len(by)] = by
                offa[sy, sx, : len(off)] = off
        idx_in[t] = (bxa, bya, offa)

    # per-shard LF / raw_quant / CfL tiles (padded to the mesh grid)
    lf_pad = np.zeros((3, GY * 32, GX * 32), np.float32)
    lf_pad[:, :bh, :bw] = np.stack(frame.lf_image)[:, :bh, :bw]
    rq_pad = np.ones((GY * 32, GX * 32), np.int32)
    rq_pad[:bh, :bw] = np.asarray(hf["raw_quant"])[:bh, :bw]
    tdim = COLOR_TILE_DIM_IN_BLOCKS
    th, tw = GY * 32 // tdim, GX * 32 // tdim
    ytox_pad = np.zeros((th, tw), np.int8)
    ytob_pad = np.zeros((th, tw), np.int8)
    ytox_pad[: hf["ytox"].shape[0], : hf["ytox"].shape[1]] = hf["ytox"][:th, :tw]
    ytob_pad[: hf["ytob"].shape[0], : hf["ytob"].shape[1]] = hf["ytob"][:th, :tw]

    # per-shard coefficient blocks: (ngy, ngx, sgy*sgx*stride) int32
    per_shard = sgy * sgx * _GROUP_STRIDE
    coeffs_sh = np.zeros((ngy, ngx, per_shard), np.int32)
    for g in group_ids:
        gy, gx = g // gw_groups, g % gw_groups
        sy, sx = gy // sgy, gx // sgx
        slot = (gy % sgy) * sgx + (gx % sgx)
        coeffs_sh[sy, sx, slot * _GROUP_STRIDE : (slot + 1) * _GROUP_STRIDE] = (
            coeffs_by_group[g].reshape(-1)
        )

    igs = np.float32(qp.inv_global_scale)
    cf = np.float32(ccp.color_factor)
    bcx = np.float32(ccp.base_correlation_x)
    bcb = np.float32(ccp.base_correlation_b)

    rf = header.restoration_filter
    gab_weights = df._gab_key(rf)
    epf_iters = int(rf.epf_iters)
    rfk = df._rf_key(rf)
    rf_obj = df._Rf()
    rf_obj.epf_channel_scale = list(rfk[0])
    rf_obj.epf_pass0_sigma_scale = rfk[1]
    rf_obj.epf_pass2_sigma_scale = rfk[2]
    rf_obj.epf_border_sad_mul = rfk[3]
    rf_obj.epf_sharp_lut = None

    def local_fn(coeffs, lf, rq, ytox, ytob, sigma_px, *tid_args):
        # per-shard inputs arrive with a leading (1, 1) mesh-block shape
        coeffs = coeffs[0, 0]
        lf = lf[0, 0]
        rq = rq[0, 0]
        ytox, ytob = ytox[0, 0], ytob[0, 0]
        sigma_px = sigma_px[0, 0]
        planes = jnp.zeros((3, sh_px * sw_px), jnp.float32)
        for ti, t in enumerate(tids):
            gbx = tid_args[3 * ti][0, 0]
            gby = tid_args[3 * ti + 1][0, 0]
            off = tid_args[3 * ti + 2][0, 0]
            nc = ncs[t]
            cx = covered_blocks_x(t)
            cy = covered_blocks_y(t)
            valid = off >= 0
            offc = jnp.maximum(off, 0)
            lanes = jnp.arange(nc, dtype=jnp.int32)
            gidx = (
                offc[:, None, None]
                + jnp.arange(3, dtype=jnp.int32)[None, :, None]
                * (GROUP_PX * GROUP_PX)
                + lanes[None, None, :]
            )
            qb = jnp.take(coeffs, gidx.reshape(-1), mode="clip").reshape(
                -1, 3, nc
            )
            q = qb.astype(jnp.float32)
            b_c = jnp.asarray(biases)
            adj = jnp.where(
                jnp.abs(qb) < 2,
                q * b_c[:3][None, :, None],
                q - b_c[3] / jnp.where(qb == 0, 1.0, q),
            )
            adj = jnp.where(qb == 0, 0.0, adj)
            rq_b = rq[gby, gbx].astype(jnp.float32)
            scaled_y = igs / rq_b
            tx = gbx // tdim
            ty = gby // tdim
            x_cc = bcx + ytox[ty, tx].astype(jnp.float32) / cf
            b_cc = bcb + ytob[ty, tx].astype(jnp.float32) / cf
            scales = jnp.stack([scaled_y * x_dm, scaled_y, scaled_y * b_dm], 1)
            dq = adj * jnp.asarray(mats[t])[None] * scales[:, :, None]
            dq = dq.at[:, 0].add(x_cc[:, None] * dq[:, 1])
            dq = dq.at[:, 2].add(b_cc[:, None] * dq[:, 1])
            iy = jnp.arange(cy, dtype=jnp.int32)
            ix = jnp.arange(cx, dtype=jnp.int32)
            lf_tiles_idx = (
                (gby[:, None, None] + iy[None, :, None]) * sw_blk
                + gbx[:, None, None]
                + ix[None, None, :]
            ).reshape(-1)
            ph, pw = cy * 8, cx * 8
            py = jnp.arange(ph, dtype=jnp.int32)
            px = jnp.arange(pw, dtype=jnp.int32)
            pidx = (
                (gby[:, None, None] * 8 + py[None, :, None]) * sw_px
                + gbx[:, None, None] * 8
                + px[None, None, :]
            )
            pidx = jnp.where(valid[:, None, None], pidx, sh_px * sw_px).reshape(-1)
            lf_flat = lf.reshape(3, -1)
            for c in (1, 0, 2):
                tiles = jnp.take(lf_flat[c], lf_tiles_idx, mode="clip").reshape(
                    -1, cy, cx
                )
                pix = transform_to_pixels_batch(jnp, t, tiles, dq[:, c])
                planes = (
                    planes.at[c, pidx].set(pix.reshape(-1), mode="drop")
                )
        chans = [p.reshape(sh_px, sw_px) for p in planes]
        # filters with 2-D halo exchange (rows then cols covers corners);
        # the per-shard gather maps then rewrite coded-padding and
        # out-of-image taps to the spec's VISIBLE-edge mirror (matching
        # the whole-image oracle, which crops to the visible rect before
        # filtering — identity maps on interior shards)
        row_map = tid_args[-2][0, 0]
        col_map = tid_args[-1][0, 0]
        if gab_weights is not None or epf_iters > 0:
            def ext(x):
                x = exchange_halo_rows(x, HALO, "gy")
                x = exchange_halo_cols(x, HALO, "gx")
                return x[row_map][:, col_map]

            chans = [ext(c) for c in chans]
            sig = ext(sigma_px)
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
            chans = [c[HALO:-HALO, HALO:-HALO] for c in chans]
        chans = render_simple.color_transform(frame, chans, xp=jnp)
        if out_format != "f32":
            chans = [
                st.convert_output(jnp, c, out_format, channel=i)
                for i, c in enumerate(chans)
            ]
        return jnp.stack(chans)[None, None]

    # sigma map in pixel resolution, padded and split per shard
    sigma_full = _sigma_px_padded(frame, GY * 32 * 8, GX * 32 * 8)
    gy_ax, gx_ax = "gy", "gx"

    def blockify(a2d, dt=None):
        """(GY*X, GX*Y) -> (ngy, ngx, X_per, Y_per) numpy view for sharding."""
        h, w = a2d.shape
        return (
            a2d.reshape(ngy, h // ngy, ngx, w // ngx).transpose(0, 2, 1, 3)
        )

    lf_b = np.stack([blockify(lf_pad[c]) for c in range(3)], axis=2)
    # lf_b: (ngy, ngx, 3, sh_blk, sw_blk)
    rq_b = blockify(rq_pad)
    ytox_b = blockify(ytox_pad.astype(np.int32))
    ytob_b = blockify(ytob_pad.astype(np.int32))
    sig_b = blockify(sigma_full.astype(np.float32))

    args = [
        jnp.asarray(coeffs_sh),
        jnp.asarray(lf_b),
        jnp.asarray(rq_b),
        jnp.asarray(ytox_b),
        jnp.asarray(ytob_b),
        jnp.asarray(sig_b),
    ]
    specs = [
        P(gy_ax, gx_ax, None),  # coefficients sharded by group ownership
        P(gy_ax, gx_ax, None, None, None),
        P(gy_ax, gx_ax, None, None),
        P(gy_ax, gx_ax, None, None),
        P(gy_ax, gx_ax, None, None),
        P(gy_ax, gx_ax, None, None),
    ]
    for t in tids:
        for arr in idx_in[t]:
            args.append(jnp.asarray(arr))
            specs.append(P(gy_ax, gx_ax, None))

    # visible-edge mirror gather maps over the extended (halo-exchanged)
    # local block: extended index e covers global rows [base-HALO,
    # base+sh+HALO); rows outside the visible image remap to their mirror
    # source, which always lies within the same edge shard
    wc_vis, hc_vis = header.size()

    def _mirror(g, n):
        if g < 0:
            g = -g - 1
        if g >= n:
            g = 2 * n - 1 - g
        return min(max(g, 0), n - 1)

    def _edge_map(n_shards, shard_len, visible):
        m = np.zeros((n_shards, shard_len + 2 * HALO), np.int32)
        for s in range(n_shards):
            base = s * shard_len
            for e in range(shard_len + 2 * HALO):
                g = base - HALO + e
                gm = _mirror(g, visible) if (g < 0 or g >= visible) else g
                m[s, e] = gm - base + HALO
        return m

    rmap = _edge_map(ngy, sh_px, hc_vis)
    cmap = _edge_map(ngx, sw_px, wc_vis)
    args.append(jnp.asarray(np.broadcast_to(rmap[:, None], (ngy, ngx, rmap.shape[1])).copy()))
    specs.append(P(gy_ax, gx_ax, None))
    args.append(jnp.asarray(np.broadcast_to(cmap[None, :], (ngy, ngx, cmap.shape[1])).copy()))
    specs.append(P(gy_ax, gx_ax, None))

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=tuple(specs),
        out_specs=P(gy_ax, gx_ax, None, None, None),
    )
    out = jax.jit(fn)(*args)
    # reassemble (ngy, ngx, 3, sh, sw) -> (3, H, W), crop to block dims
    o = np.asarray(out)
    o = o.transpose(2, 0, 3, 1, 4).reshape(3, GY * 32 * 8, GX * 32 * 8)
    return o[:, : bh * 8, : bw * 8]


def _sigma_px_padded(frame, hp: int, wp: int):
    """Pixel-resolution EPF inv-sigma map, edge-padded to (hp, wp) —
    the same computation the single-chip program feeds the filters."""
    from ..render import device_filters as df
    from ..render.stages import core as st

    rf = frame.header.restoration_filter
    if rf.epf_iters <= 0:
        return np.zeros((hp, wp), np.float32)
    sigma_block = st.compute_sigma_image(frame)
    h, w = sigma_block.shape[0] * 8, sigma_block.shape[1] * 8
    sig = df._sigma_px(rf, sigma_block, None, h, w)
    out = np.zeros((hp, wp), np.float32)
    hh, ww = min(h, hp), min(w, wp)
    out[:hh, :ww] = sig[:hh, :ww]
    if hh < hp:
        out[hh:, :ww] = out[hh - 1 : hh, :ww]
    if ww < wp:
        out[:, ww:] = out[:, ww - 1 : ww]
    return out
