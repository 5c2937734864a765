"""Whole-frame VarDCT dequant + CfL + IDCT as one device program.

The TPU-native formulation of the reference's per-group numeric path
(frame/group.rs:138-237 dequant_and_transform_to_pixels): the host ships
quantized coefficients + per-block metadata once, the device gathers,
dequantizes (with quant bias), applies chroma-from-luma, runs the IDCTs
as batched MXU matmuls (transforms_batch with xp=jnp), and scatters the
pixels — and the resulting planes stay device-resident, feeding straight
into the fused filter/color program with no pixel round trip.

Scope: 4:4:4 frames, every transform class (multi-block DCT16/32/...
included: LF patches gather and pixels scatter through flat indices
computed on-device from the block coordinates). Chroma-subsampled frames
keep the host path.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

import jax
import jax.numpy as jnp

from .. import GROUP_DIM
from .transform_map import covered_blocks_x, covered_blocks_y
from .transforms_batch import transform_to_pixels_batch

BLOCK_DIM = 8
BLOCK_SIZE = 64
COLOR_TILE_DIM_IN_BLOCKS = 8


def eligible(frame) -> bool:
    """Any VarDCT frame with placed transforms (non-444 frames only carry
    1x1-coverage transforms per the spec's big-blocks-are-444-only rule)."""
    if frame.hf_meta is None:
        return False
    tmap = frame.hf_meta["transform"]
    return bool((tmap >= 128).any())


def _frame_blocks(frame, group_ids: list):
    """Host prep: per-tid whole-frame block arrays (all cheap numpy)."""
    header = frame.header
    hf = frame.hf_meta
    tmap = hf["transform"]
    by_tid: dict[int, list] = {}
    gindex = {g: i for i, g in enumerate(group_ids)}
    for g in group_ids:
        (gx0, gy0), (gw, gh) = header.block_group_rect(g)
        sub = tmap[gy0 : gy0 + gh, gx0 : gx0 + gw]
        ys, xs = np.nonzero(sub >= 128)
        tids = sub[ys, xs] & 127
        # per-group coefficient offsets follow raster placement order
        order = np.argsort(ys * gw + xs, kind="stable")
        offs = np.zeros(len(ys), dtype=np.int64)
        acc = 0
        for i in order:
            offs[i] = acc
            cx = covered_blocks_x(int(tids[i]))
            cy = covered_blocks_y(int(tids[i]))
            acc += cx * cy * BLOCK_SIZE
        for t in np.unique(tids):
            sel = tids == t
            rec = by_tid.setdefault(int(t), [[], [], [], []])
            rec[0].append(xs[sel] + gx0)
            rec[1].append(ys[sel] + gy0)
            rec[2].append(np.full(sel.sum(), gindex[g], dtype=np.int64))
            rec[3].append(offs[sel])
    out = {}
    for t, (bx, by, gi, off) in by_tid.items():
        out[t] = (
            np.concatenate(bx).astype(np.int32),
            np.concatenate(by).astype(np.int32),
            np.concatenate(gi).astype(np.int32),
            np.concatenate(off).astype(np.int32),
        )
    return out


# program cache: key = static frame config + per-tid counts
_CACHE: dict = {}

_GROUP_STRIDE = 3 * GROUP_DIM * GROUP_DIM


def _sparse_coeffs(coeffs_by_group: dict, group_ids: list):
    """Pack the per-group coefficient buffers (mostly zeros) for the
    host->device wire as a nonzero BITMASK (total/8 bytes) + int16 values
    (2 bytes per nonzero) — ~2.5 bytes/nz vs 8 for index+value COO; at
    ~27% density on a 1 MP photo this is the difference between an 8.4 MB
    and a 2.5 MB upload through the tunnel. The device rebuilds the dense
    buffer with bit-unpack + prefix-sum + rank-gather (cumsum is
    TPU-native). Values outside int16 fall back to index+value COO
    (mode "coo"; padding indices point one past the end)."""
    total = len(group_ids) * _GROUP_STRIDE
    flat = np.empty(total, np.int32)
    for i, g in enumerate(group_ids):
        flat[i * _GROUP_STRIDE : (i + 1) * _GROUP_STRIDE] = coeffs_by_group[
            g
        ].reshape(-1)
    nzmask = flat != 0
    vals = flat[nzmask]
    n = len(vals)
    bucket = 1 << max(10, (max(n, 1) - 1).bit_length())
    if n and (vals.max() > 32767 or vals.min() < -32768):
        idx = np.flatnonzero(nzmask).astype(np.int32)
        if bucket > n:
            idx = np.concatenate([idx, np.full(bucket - n, total, np.int32)])
            vals = np.concatenate([vals, np.zeros(bucket - n, flat.dtype)])
        return "coo", idx, vals.astype(np.int32), total, bucket
    v16 = np.zeros(bucket, np.int16)
    v16[:n] = vals.astype(np.int16)
    mask = np.packbits(nzmask, bitorder="little")
    return "mask", mask, v16, total, bucket


def _unpack_coeffs_device(mode, a1, a2, total):
    """Device-side dense coefficient reconstruction from the wire format."""
    if mode == "dense":
        return a1
    if mode == "coo":
        return jnp.zeros(total + 1, jnp.int32).at[a1].set(a2)[:total]
    # mask: a1 = packed bits (total/8 u8), a2 = int16 values in rank order
    bits = (
        (a1[:, None] >> jnp.arange(8, dtype=jnp.uint8)[None, :]) & 1
    ).reshape(-1)[:total].astype(jnp.int32)
    rank = jnp.cumsum(bits) - 1
    vals = jnp.take(a2.astype(jnp.int32), rank, mode="clip")
    return jnp.where(bits == 1, vals, 0)


def render_vardct_frame_device(frame, coeffs_by_group=None, device_flat=None):
    """Returns device planes (3, bh*8, bw*8) f32 (jax arrays, no download).

    Coefficients come either host-side via `coeffs_by_group` ({group:
    (3, GD*GD) int32}, COO-packed for the upload) or device-resident via
    `device_flat` ((G*3*GD*GD,) int32 from the device AC decoder — no
    upload at all)."""
    header = frame.header
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

    if device_flat is not None:
        mode = "dense"
        group_ids = list(range(header.num_groups))
        total = len(group_ids) * _GROUP_STRIDE
        nz_bucket = 0
    else:
        group_ids = sorted(coeffs_by_group)
        mode, nz_a1, nz_a2, total, nz_bucket = _sparse_coeffs(
            coeffs_by_group, group_ids
        )
    blocks = _frame_blocks(frame, group_ids)
    tids = tuple(sorted(blocks))
    counts = tuple(len(blocks[t][0]) for t in tids)
    # pad per-tid counts to power-of-two buckets for compile reuse
    pads = tuple(1 << max(4, int(np.ceil(np.log2(max(c, 1))))) for c in counts)

    ncs = {
        t: covered_blocks_x(t) * covered_blocks_y(t) * BLOCK_SIZE for t in tids
    }
    mats = {
        t: np.stack(
            [np.asarray(dqm.matrix(t, c)[: ncs[t]], np.float32) for c in range(3)]
        )
        for t in tids
    }
    key = (
        tids,
        pads,
        mode,
        nz_bucket,
        len(group_ids),
        bw,
        bh,
        float(qp.inv_global_scale),
        float(x_dm),
        float(b_dm),
        float(ccp.base_correlation_x),
        float(ccp.base_correlation_b),
        float(ccp.color_factor),
        tuple(float(b) for b in biases),
        tuple(hashlib.sha1(mats[t].tobytes()).hexdigest() for t in tids),
    )
    fn = _CACHE.get(key)
    if fn is None:
        igs = np.float32(qp.inv_global_scale)
        cf = np.float32(ccp.color_factor)
        bcx = np.float32(ccp.base_correlation_x)
        bcb = np.float32(ccp.base_correlation_b)
        mats_c = {t: jnp.asarray(mats[t]) for t in tids}
        b_c = jnp.asarray(biases)

        W = bw * BLOCK_DIM

        total_c = total
        mode_c = mode

        def program(nz_i, nz_v, lf, rq, ytox, ytob, idx_args):
            # TPU matmuls default to bf16 inputs; the IDCT einsums need f32
            return _program_impl(nz_i, nz_v, lf, rq, ytox, ytob, idx_args)

        def _program_impl(nz_i, nz_v, lf, rq, ytox, ytob, idx_args):
            # nz_i/nz_v: wire-packed coefficients (see _sparse_coeffs), or
            # (dense) the flat device buffer itself;
            # lf: (3, bh, bw) f32; rq: (bh, bw) i32; ytox/ytob: (th, tw) i8
            planes = jnp.zeros((3, bh * BLOCK_DIM * W), jnp.float32)
            flat = _unpack_coeffs_device(mode_c, nz_i, nz_v, total_c)
            lf_flat = lf.reshape(3, -1)
            stride_g = 3 * GROUP_DIM * GROUP_DIM
            stride_c = GROUP_DIM * GROUP_DIM
            for ti, t in enumerate(tids):
                gbx, gby, gi, off = idx_args[ti]
                n = gbx.shape[0]
                nc = ncs[t]
                cx = covered_blocks_x(t)
                cy = covered_blocks_y(t)
                base = gi.astype(jnp.int32) * stride_g + off.astype(jnp.int32)
                lanes = jnp.arange(nc, dtype=jnp.int32)
                gidx = base[:, None, None] + (
                    jnp.arange(3, dtype=jnp.int32)[None, :, None] * stride_c
                ) + lanes[None, None, :]
                qb = jnp.take(flat, gidx.reshape(-1), mode="clip").reshape(n, 3, nc)
                q = qb.astype(jnp.float32)
                adj = jnp.where(
                    jnp.abs(qb) < 2,
                    q * b_c[:3][None, :, None],
                    q - b_c[3] / jnp.where(qb == 0, 1.0, q),
                )
                adj = jnp.where(qb == 0, 0.0, adj)
                rq_b = rq[gby, gbx].astype(jnp.float32)
                scaled_y = igs / rq_b
                tx = gbx // COLOR_TILE_DIM_IN_BLOCKS
                ty = gby // COLOR_TILE_DIM_IN_BLOCKS
                x_cc = bcx + ytox[ty, tx].astype(jnp.float32) / cf
                b_cc = bcb + ytob[ty, tx].astype(jnp.float32) / cf
                scales = jnp.stack(
                    [scaled_y * x_dm, scaled_y, scaled_y * b_dm], axis=1
                )
                dq = adj * mats_c[t][None] * scales[:, :, None]
                dq = dq.at[:, 0].add(x_cc[:, None] * dq[:, 1])
                dq = dq.at[:, 2].add(b_cc[:, None] * dq[:, 1])
                # LF patch gather: (N, cy, cx) from block coords + static grid
                iy = jnp.arange(cy, dtype=jnp.int32)
                ix = jnp.arange(cx, dtype=jnp.int32)
                lf_idx = (
                    (gby[:, None, None] + iy[None, :, None]) * bw
                    + gbx[:, None, None]
                    + ix[None, None, :]
                ).reshape(-1)
                ph, pw = cy * BLOCK_DIM, cx * BLOCK_DIM
                # pixel scatter: flat indices from block coords + static grid
                py = jnp.arange(ph, dtype=jnp.int32)
                px = jnp.arange(pw, dtype=jnp.int32)
                pidx = (
                    (gby[:, None, None] * BLOCK_DIM + py[None, :, None]) * W
                    + gbx[:, None, None] * BLOCK_DIM
                    + px[None, None, :]
                ).reshape(-1)
                for c in (1, 0, 2):
                    lf_tiles = jnp.take(lf_flat[c], lf_idx, mode="clip").reshape(
                        n, cy, cx
                    )
                    pix = transform_to_pixels_batch(jnp, t, lf_tiles, dq[:, c])
                    planes = planes.at[c, pidx].set(pix.reshape(-1))
            return planes.reshape(3, bh * BLOCK_DIM, W)

        def wrapped(*args):
            with jax.default_matmul_precision("float32"):
                return program(*args)

        fn = jax.jit(wrapped)
        _CACHE[key] = fn

    # assemble inputs (pad per-tid arrays to bucket sizes; padded entries
    # re-write block (0,0)'s pixels with clip-gathered data of block 0 —
    # avoid by pointing them at the first real block so the scatter is a
    # harmless duplicate write of identical values)
    idx_args = []
    for t, n, p in zip(tids, counts, pads):
        gbx, gby, gi, off = blocks[t]
        if p > n:
            gbx = np.concatenate([gbx, np.full(p - n, gbx[0], np.int32)])
            gby = np.concatenate([gby, np.full(p - n, gby[0], np.int32)])
            gi = np.concatenate([gi, np.full(p - n, gi[0], np.int32)])
            off = np.concatenate([off, np.full(p - n, off[0], np.int32)])
        idx_args.append((gbx, gby, gi, off))

    th = -(-bh // COLOR_TILE_DIM_IN_BLOCKS)
    tw = -(-bw // COLOR_TILE_DIM_IN_BLOCKS)
    if mode == "dense":
        a1, a2 = device_flat, np.zeros(1, np.int32)
    else:
        a1, a2 = nz_a1, nz_a2
    # one batched transfer: per-array uploads pay ~28 ms tunnel latency each
    args = jax.device_put(
        (
            a1,
            a2,
            np.stack(frame.lf_image),
            np.asarray(hf["raw_quant"], dtype=np.int32),
            np.ascontiguousarray(hf["ytox"][:th, :tw]),
            np.ascontiguousarray(hf["ytob"][:th, :tw]),
            tuple(idx_args),
        )
    )
    return fn(*args)


# -- chroma-subsampled frames (ref: big blocks are 444-only, so all
# -- transforms here cover exactly one 8x8 block) ---------------------------

_SUB_CACHE: dict = {}


def render_vardct_frame_device_subsampled(
    frame, coeffs_by_group=None, device_flat=None
):
    """Device render for non-444 frames: per-channel aligned-block
    selection, per-channel planes, and in-program chroma upsampling so the
    output is full-resolution (3, bh*8, bw*8) like the 444 path."""
    from ..render.stages import core as st

    header = frame.header
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
    hs = [header.hshift(c) for c in range(3)]
    vs = [header.vshift(c) for c in range(3)]

    if device_flat is not None:
        mode = "dense"
        group_ids = list(range(header.num_groups))
        total = len(group_ids) * _GROUP_STRIDE
        nz_bucket = 0
    else:
        group_ids = sorted(coeffs_by_group)
        mode, nz_a1, nz_a2, total, nz_bucket = _sparse_coeffs(
            coeffs_by_group, group_ids
        )
    blocks = _frame_blocks(frame, group_ids)
    tids = tuple(sorted(blocks))
    for t in tids:
        assert covered_blocks_x(t) == 1 and covered_blocks_y(t) == 1, t

    # per-(tid, channel) aligned-block selections + padded bucket sizes
    sel_arrays = {}
    pads = []
    for t in tids:
        gbx, gby, gi, off = blocks[t]
        per_c = []
        for c in range(3):
            m = (((gbx >> hs[c]) << hs[c]) == gbx) & (
                ((gby >> vs[c]) << vs[c]) == gby
            )
            per_c.append((gbx[m], gby[m], gi[m], off[m]))
        sel_arrays[t] = per_c
        pads.append(
            tuple(
                1 << max(4, int(np.ceil(np.log2(max(len(a[0]), 1)))))
                for a in per_c
            )
        )
    pads = tuple(pads)

    ncs = {t: BLOCK_SIZE for t in tids}
    mats = {
        t: np.stack(
            [np.asarray(dqm.matrix(t, c)[:BLOCK_SIZE], np.float32) for c in range(3)]
        )
        for t in tids
    }
    key = (
        "sub",
        tids,
        pads,
        mode,
        nz_bucket,
        len(group_ids),
        bw,
        bh,
        tuple(hs),
        tuple(vs),
        float(qp.inv_global_scale),
        float(x_dm),
        float(b_dm),
        float(ccp.base_correlation_x),
        float(ccp.base_correlation_b),
        float(ccp.color_factor),
        tuple(float(b) for b in biases),
        tuple(hashlib.sha1(mats[t].tobytes()).hexdigest() for t in tids),
    )
    fn = _SUB_CACHE.get(key)
    if fn is None:
        igs = np.float32(qp.inv_global_scale)
        cf = np.float32(ccp.color_factor)
        bcx = np.float32(ccp.base_correlation_x)
        bcb = np.float32(ccp.base_correlation_b)
        mats_c = {t: jnp.asarray(mats[t]) for t in tids}
        b_c = jnp.asarray(biases)
        W = bw * BLOCK_DIM
        H = bh * BLOCK_DIM
        plane_dims = [((H >> vs[c]), (W >> hs[c])) for c in range(3)]

        def dequant_channel(flat, rq, ytox, ytob, t, c, gbx, gby, gi, off):
            stride_g = 3 * GROUP_DIM * GROUP_DIM
            stride_c = GROUP_DIM * GROUP_DIM
            lanes = jnp.arange(BLOCK_SIZE, dtype=jnp.int32)

            def gather(ch):
                gidx = (
                    gi.astype(jnp.int32) * stride_g
                    + ch * stride_c
                    + off.astype(jnp.int32)
                )[:, None] + lanes[None, :]
                return jnp.take(flat, gidx.reshape(-1), mode="clip").reshape(
                    gbx.shape[0], BLOCK_SIZE
                )

            def adj_of(qb):
                q = qb.astype(jnp.float32)
                a = jnp.where(
                    jnp.abs(qb) < 2,
                    q * b_c[c][None, None],
                    q - b_c[3] / jnp.where(qb == 0, 1.0, q),
                )
                return jnp.where(qb == 0, 0.0, a)

            rq_b = rq[gby, gbx].astype(jnp.float32)
            scaled_y = igs / rq_b
            dm = {0: x_dm, 1: np.float32(1.0), 2: b_dm}[c]
            qb_c = gather(c)
            dq_c = adj_of(qb_c) * mats_c[t][c][None] * (scaled_y * dm)[:, None]
            if c != 1:
                # CfL adds the y-channel dequant of the same block
                qb_y = gather(1)
                qy = qb_y.astype(jnp.float32)
                adj_y = jnp.where(
                    jnp.abs(qb_y) < 2,
                    qy * b_c[1][None, None],
                    qy - b_c[3] / jnp.where(qb_y == 0, 1.0, qy),
                )
                adj_y = jnp.where(qb_y == 0, 0.0, adj_y)
                dq_y = adj_y * mats_c[t][1][None] * scaled_y[:, None]
                tx = gbx // COLOR_TILE_DIM_IN_BLOCKS
                ty = gby // COLOR_TILE_DIM_IN_BLOCKS
                cc = (
                    (bcx + ytox[ty, tx].astype(jnp.float32) / cf)
                    if c == 0
                    else (bcb + ytob[ty, tx].astype(jnp.float32) / cf)
                )
                dq_c = dq_c + cc[:, None] * dq_y
            return dq_c

        total_c = total
        mode_c = mode

        def program(nz_i, nz_v, lf, rq, ytox, ytob, idx_args):
            flat = _unpack_coeffs_device(mode_c, nz_i, nz_v, total_c)
            lf_flat = lf.reshape(3, -1)
            chans = []
            for c in range(3):
                hc, wc = plane_dims[c]
                plane = jnp.zeros(hc * wc, jnp.float32)
                for ti, t in enumerate(tids):
                    gbx, gby, gi, off = idx_args[ti][c]
                    dq = dequant_channel(flat, rq, ytox, ytob, t, c, gbx, gby, gi, off)
                    cbx = gbx >> hs[c]
                    cby = gby >> vs[c]
                    lf_idx = cby * bw + cbx
                    lf_tiles = jnp.take(lf_flat[c], lf_idx, mode="clip")
                    pix = transform_to_pixels_batch(
                        jnp, t, lf_tiles[:, None, None], dq
                    )
                    py = jnp.arange(BLOCK_DIM, dtype=jnp.int32)
                    px = jnp.arange(BLOCK_DIM, dtype=jnp.int32)
                    rows = cby[:, None, None] * BLOCK_DIM + py[None, :, None]
                    cols = cbx[:, None, None] * BLOCK_DIM + px[None, None, :]
                    pidx = jnp.where(
                        (rows < hc) & (cols < wc), rows * wc + cols, -1
                    ).reshape(-1)
                    plane = plane.at[pidx].set(pix.reshape(-1), mode="drop")
                ch = plane.reshape(hc, wc)
                for _ in range(hs[c]):
                    ch = st.chroma_upsample_h(jnp, ch)
                for _ in range(vs[c]):
                    ch = st.chroma_upsample_v(jnp, ch)
                chans.append(ch[:H, :W])
            return jnp.stack(chans)

        fn = jax.jit(program)
        _SUB_CACHE[key] = fn

    idx_args = []
    for ti, t in enumerate(tids):
        per_c = []
        for c in range(3):
            gbx, gby, gi, off = sel_arrays[t][c]
            p = pads[ti][c]
            n = len(gbx)
            if p > n:
                fillx = gbx[0] if n else 0
                filly = gby[0] if n else 0
                gbx = np.concatenate([gbx, np.full(p - n, fillx, np.int32)])
                gby = np.concatenate([gby, np.full(p - n, filly, np.int32)])
                gi = np.concatenate([gi, np.full(p - n, gi[0] if n else 0, np.int32)])
                off = np.concatenate([off, np.full(p - n, off[0] if n else 0, np.int32)])
            per_c.append((gbx, gby, gi, off))
        idx_args.append(tuple(per_c))

    th = -(-bh // COLOR_TILE_DIM_IN_BLOCKS)
    tw = -(-bw // COLOR_TILE_DIM_IN_BLOCKS)
    if mode == "dense":
        a1, a2 = device_flat, np.zeros(1, np.int32)
    else:
        a1, a2 = nz_a1, nz_a2
    args = jax.device_put(
        (
            a1,
            a2,
            np.stack(frame.lf_image),
            np.asarray(hf["raw_quant"], dtype=np.int32),
            np.ascontiguousarray(hf["ytox"][:th, :tw]),
            np.ascontiguousarray(hf["ytob"][:th, :tw]),
            tuple(idx_args),
        )
    )
    return fn(*args)
