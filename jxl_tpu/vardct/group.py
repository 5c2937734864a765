"""VarDCT HF group decode: per-block nonzero prediction, coefficient rANS
decode in coded order, cross-pass accumulation, dequant with CfL and
quant-bias, and inverse transform to pixels.

Capability reference: jxl/src/frame/group.rs. The coefficient entropy loop
runs natively (jxl_tpu/native, verified bit-exact vs the Python oracle
below); the numeric part (dequant + CfL + IDCT) is batched numpy/JAX.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..entropy import SymbolReader
from ..errors import InvalidBitstream
from .block_context import zero_density_context
from .cfl import COLOR_TILE_DIM_IN_BLOCKS
from .transform_map import (
    block_shape_id,
    covered_blocks_x,
    covered_blocks_y,
)
from .transforms import transform_to_pixels

BLOCK_DIM = 8
BLOCK_SIZE = 64
GROUP_DIM = 256


def _ceil_log2(x: int) -> int:
    return (x - 1).bit_length() if x > 1 else 0


def _predict_num_nonzeros(nzeros, bx, by):
    if bx == 0:
        return 32 if by == 0 else int(nzeros[by - 1][0])
    if by == 0:
        return int(nzeros[by][bx - 1])
    return (int(nzeros[by - 1][bx]) + int(nzeros[by][bx - 1]) + 1) // 2


def ensure_pixel_buffers(frame) -> None:
    if frame.vardct_pixels is None:
        bw, bh = frame.header.size_blocks()
        frame.vardct_pixels = [
            np.zeros(
                (
                    (bh * BLOCK_DIM) >> frame.header.vshift(c),
                    (bw * BLOCK_DIM) >> frame.header.hshift(c),
                ),
                dtype=np.float32,
            )
            for c in range(3)
        ]


def adjust_quant_bias(quant: np.ndarray, c: int, biases) -> np.ndarray:
    """ref group.rs:85-97."""
    q = quant.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        adjusted = np.where(quant == 0, 0.0, q - np.float32(biases[3]) / q)
    return np.where(np.abs(quant) < 2, q * np.float32(biases[c]), adjusted).astype(
        np.float32
    )


class _BlockList:
    """Geometry of all transform blocks in a group, precomputed once."""

    def __init__(self, frame, group):
        header = frame.header
        hf = frame.hf_meta
        (gx0, gy0), (gw, gh) = header.block_group_rect(group)
        self.origin = (gx0, gy0)
        self.size = (gw, gh)
        hshift = [header.hshift(c) for c in range(3)]
        vshift = [header.vshift(c) for c in range(3)]
        self.hshift, self.vshift = hshift, vshift
        tmap = hf["transform"]
        self.blocks = []  # (bx, by, tid, cx, cy, shape_id, coeffs_offset)
        coeffs_offset = 0
        for by in range(gh):
            for bx in range(gw):
                raw = int(tmap[gy0 + by, gx0 + bx])
                if raw < 128:
                    continue
                tid = raw & 127
                cx, cy = covered_blocks_x(tid), covered_blocks_y(tid)
                self.blocks.append(
                    (bx, by, tid, cx, cy, block_shape_id(tid), coeffs_offset)
                )
                coeffs_offset += cx * cy * BLOCK_SIZE


def decode_vardct_group(frame, group: int, pass_readers: list, render: bool = True) -> None:
    header = frame.header
    lf_global = frame.lf_global
    hf_global = frame.hf_global
    hf = frame.hf_meta
    ensure_pixel_buffers(frame)

    bl = _BlockList(frame, group)
    (gx0, gy0) = bl.origin
    (gw, gh) = bl.size
    hshift, vshift = bl.hshift, bl.vshift
    bctx = lf_global.block_context_map
    num_histo_bits = _ceil_log2(hf_global.num_histograms)

    keep = header.passes.num_passes > 1 or not frame.render_after_decode
    if keep and group in hf_global.hf_coefficients:
        coeffs = hf_global.hf_coefficients[group]
    else:
        coeffs = np.zeros((3, GROUP_DIM * GROUP_DIM), dtype=np.int32)
        if keep:
            hf_global.hf_coefficients[group] = coeffs

    from .. import native

    use_native = native.available()

    rqmap = hf["raw_quant"]
    qlfmap = hf["quant_lf"]

    for pass_idx, br in pass_readers:
        histogram_index = br.read(num_histo_bits)
        if histogram_index >= hf_global.num_histograms:
            raise InvalidBitstream("invalid histogram index")
        shift = (
            header.passes.shift[pass_idx] if pass_idx < len(header.passes.shift) else 0
        )
        pstate = hf_global.passes[pass_idx]
        ctx_off = histogram_index * bctx.num_ac_contexts

        if use_native:
            _decode_pass_native(
                frame, bl, pstate, br, ctx_off, shift, coeffs, bctx, native
            )
        else:
            _decode_pass_oracle(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx)

    if render and frame.render_after_decode:
        _render_group(frame, group, bl, coeffs)


def _block_contexts(frame, bl, bctx, bx, by, tid, shape_id):
    (gx0, gy0) = bl.origin
    rq = int(frame.hf_meta["raw_quant"][gy0 + by, gx0 + bx])
    qlf = int(frame.hf_meta["quant_lf"][gy0 + by, gx0 + bx])
    return rq, qlf


def _decode_pass_native(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx, native):
    header = frame.header
    (gx0, gy0) = bl.origin
    (gw, gh) = bl.size
    hshift, vshift = bl.hshift, bl.vshift
    hf = frame.hf_meta

    # concatenated per-(shape,channel) orders used by this pass
    order_keys = {}
    order_parts = []
    order_pos = 0
    items = []
    for (bx, by, tid, cx, cy, shape_id, off) in bl.blocks:
        rq, qlf = _block_contexts(frame, bl, bctx, bx, by, tid, shape_id)
        num_blocks = cx * cy
        num_coeffs = num_blocks * BLOCK_SIZE
        sbx = [bx >> hshift[c] for c in range(3)]
        sby = [by >> vshift[c] for c in range(3)]
        for c in (1, 0, 2):
            if (sbx[c] << hshift[c]) != bx or (sby[c] << vshift[c]) != by:
                continue
            key = (shape_id, c)
            if key not in order_keys:
                order = pstate.coeff_orders[shape_id * 3 + c]
                order_keys[key] = order_pos
                order_parts.append(np.array(order, dtype=np.int32))
                order_pos += len(order)
            block_context = bctx.block_context(qlf, rq, shape_id, c)
            items.append(
                (
                    c, sbx[c], sby[c], num_blocks, num_coeffs, block_context,
                    ctx_off, order_keys[key], c * GROUP_DIM * GROUP_DIM + off,
                    cx, cy,
                )
            )
    items_arr = np.array(items, dtype=np.int32).reshape(-1, 11)
    orders_arr = (
        np.concatenate(order_parts) if order_parts else np.zeros(1, dtype=np.int32)
    )

    nz_dims = np.zeros((3, 3), dtype=np.int32)
    off = 0
    for c in range(3):
        w = gw >> hshift[c]
        h = gh >> vshift[c]
        nz_dims[c] = (w, h, off)
        off += w * h
    nzeros_maps = np.zeros(max(off, 1), dtype=np.int32)

    ent = native.pack_entropy(pstate.histograms)
    lib = native.get_lib()
    bit_pos = ctypes.c_uint64(br.pos)
    ret = lib.jxl_decode_vardct_ac(
        br.data, ctypes.c_uint64(len(br.data)), ctypes.byref(bit_pos),
        ctypes.c_int(ent["use_prefix"]),
        native._ptr(ent["ans_tables"], ctypes.c_int32),
        ctypes.c_int(ent["table_size"]), ctypes.c_int(ent["log_bucket"]),
        native._ptr(ent["huff_offsets"], ctypes.c_int32),
        native._ptr(ent["huff_bits"], ctypes.c_int32),
        native._ptr(ent["huff_values"], ctypes.c_int32),
        native._ptr(ent["context_map"], ctypes.c_uint8),
        ctypes.c_int(len(ent["context_map"])),
        native._ptr(ent["uint_configs"], ctypes.c_int32),
        ctypes.c_int(ent["lz77"]), ctypes.c_uint32(ent["min_symbol"]),
        ctypes.c_uint32(ent["min_length"]), native._ptr(ent["lz_cfg"], ctypes.c_int32),
        ctypes.c_int(ent["lz_dist_cluster"]), ctypes.c_uint32(0),
        ctypes.c_int(len(items_arr)), native._ptr(items_arr, ctypes.c_int32),
        native._ptr(orders_arr, ctypes.c_int32),
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(shift), ctypes.c_int(bctx.num_contexts),
        native._ptr(nzeros_maps, ctypes.c_int32),
        native._ptr(nz_dims, ctypes.c_int32),
    )
    if ret != 0:
        raise InvalidBitstream(f"native vardct AC decode failed (code {ret})")
    br.pos = bit_pos.value


def _decode_pass_oracle(frame, bl, pstate, br, ctx_off, shift, coeffs, bctx):
    header = frame.header
    hshift, vshift = bl.hshift, bl.vshift
    (gw, gh) = bl.size
    reader = SymbolReader(pstate.histograms, br)
    histograms = pstate.histograms
    num_nzeros = [
        [[0] * (gw >> hshift[c]) for _ in range(gh >> vshift[c])] for c in range(3)
    ]
    for (bx, by, tid, cx, cy, shape_id, off) in bl.blocks:
        rq, qlf = _block_contexts(frame, bl, bctx, bx, by, tid, shape_id)
        num_blocks = cx * cy
        num_coeffs = num_blocks * BLOCK_SIZE
        log_num_blocks = num_blocks.bit_length() - 1
        sbx = [bx >> hshift[c] for c in range(3)]
        sby = [by >> vshift[c] for c in range(3)]
        for c in (1, 0, 2):
            if (sbx[c] << hshift[c]) != bx or (sby[c] << vshift[c]) != by:
                continue
            nz = num_nzeros[c]
            predicted = _predict_num_nonzeros(nz, sbx[c], sby[c])
            block_context = bctx.block_context(qlf, rq, shape_id, c)
            nonzero_ctx = bctx.nonzero_context(predicted, block_context) + ctx_off
            nonzeros = reader.read_unsigned(histograms, br, nonzero_ctx)
            if nonzeros + num_blocks > num_coeffs:
                raise InvalidBitstream("invalid number of nonzeros")
            fill = -(-nonzeros // num_blocks)
            for iy in range(cy):
                row = nz[sby[c] + iy]
                for ix in range(cx):
                    row[sbx[c] + ix] = fill
            histo_off = bctx.zero_density_context_offset(block_context) + ctx_off
            prev = 0 if nonzeros > (num_coeffs >> 4) else 1
            order = pstate.coeff_orders[shape_id * 3 + c]
            cbuf = coeffs[c]
            for k in range(num_blocks, num_coeffs):
                if nonzeros == 0:
                    break
                ctx = histo_off + zero_density_context(nonzeros, k, log_num_blocks, prev)
                coeff = reader.read_signed(histograms, br, ctx) << shift
                prev = 1 if coeff != 0 else 0
                nonzeros -= prev
                cbuf[off + order[k]] += coeff
            if nonzeros != 0:
                raise InvalidBitstream("end-of-block residual nonzeros")
    reader.check_final_state(histograms, br)


def _render_group(frame, group, bl, coeffs):
    """Numeric part: dequant + CfL + IDCT, batched per transform type.

    Blocks of each type run as a few einsums over (N, ...) batches — the
    same program the TPU device path compiles (see transforms_batch.py).
    """
    header = frame.header
    lf_global = frame.lf_global
    hf_global = frame.hf_global
    hf = frame.hf_meta
    (gx0, gy0) = bl.origin
    hshift, vshift = bl.hshift, bl.vshift
    ccp = lf_global.color_correlation_params
    qp = lf_global.quant_params
    inv_global_scale = qp.inv_global_scale
    quant_biases = np.asarray(
        frame.file_header.transform_data.opsin_inverse_matrix.quant_biases,
        dtype=np.float32,
    )
    dqm = hf_global.dequant_matrices
    x_dm = np.float32((1.0 / 1.25) ** (header.x_qm_scale - 2.0))
    b_dm = np.float32((1.0 / 1.25) ** (header.b_qm_scale - 2.0))
    ytox, ytob = hf["ytox"], hf["ytob"]
    rqmap = hf["raw_quant"]
    is444 = header.is444

    from .transforms_batch import transform_to_pixels_batch

    # bucket blocks by transform type
    by_tid: dict[int, list] = {}
    for blk in bl.blocks:
        by_tid.setdefault(blk[2], []).append(blk)

    for tid, blks in by_tid.items():
        cx = covered_blocks_x(tid)
        cy = covered_blocks_y(tid)
        num_coeffs = cx * cy * BLOCK_SIZE
        n = len(blks)
        bxs = np.array([b[0] for b in blks])
        bys = np.array([b[1] for b in blks])
        offs = np.array([b[6] for b in blks])
        gbx = bxs + gx0
        gby = bys + gy0
        tx = gbx // COLOR_TILE_DIM_IN_BLOCKS
        ty = gby // COLOR_TILE_DIM_IN_BLOCKS
        x_cc = (
            ccp.base_correlation_x
            + ytox[ty, tx].astype(np.float32) / ccp.color_factor
        )
        b_cc = (
            ccp.base_correlation_b
            + ytob[ty, tx].astype(np.float32) / ccp.color_factor
        )
        rq = rqmap[gby, gbx].astype(np.float32)
        scaled_y = np.float32(inv_global_scale) / rq  # (N,)

        # gather quantized coefficients: (N, 3, num_coeffs)
        idx = offs[:, None] + np.arange(num_coeffs)[None, :]
        qb = np.stack([coeffs[c][idx] for c in range(3)], axis=1)
        q = qb.astype(np.float32)
        with np.errstate(divide="ignore", invalid="ignore"):
            adj = np.where(qb == 0, 0.0, q - quant_biases[3] / q)
        adj = np.where(np.abs(qb) < 2, q * quant_biases[None, :3, None], adj).astype(np.float32)
        mats = np.stack([dqm.matrix(tid, c)[:num_coeffs] for c in range(3)])  # (3, nc)
        scales = np.stack([scaled_y * x_dm, scaled_y, scaled_y * b_dm], axis=1)  # (N,3)
        dq = adj * mats[None] * scales[:, :, None]
        dq[:, 0] += x_cc[:, None] * dq[:, 1]
        dq[:, 2] += b_cc[:, None] * dq[:, 1]

        for c in (1, 0, 2):
            if is444:
                sel = np.arange(n)
                lfx = gbx
                lfy = gby
            else:
                mask = ((gbx >> hshift[c]) << hshift[c] == gbx) & (
                    (gby >> vshift[c]) << vshift[c] == gby
                )
                # chroma decodes only at aligned blocks; big blocks are 444-only
                mask &= ((bxs >> hshift[c]) << hshift[c] == bxs) & (
                    (bys >> vshift[c]) << vshift[c] == bys
                )
                sel = np.nonzero(mask)[0]
                if len(sel) == 0:
                    continue
                lfx = gbx[sel] >> hshift[c]
                lfy = gby[sel] >> vshift[c]
            # LF tiles: (Nc, cy, cx)
            lf_plane = frame.lf_image[c]
            outp = frame.vardct_pixels[c]
            if cx == 1 and cy == 1:
                # dominant case (DCT8/DCT4x4/DCT2/identity/AFV): fully
                # vectorized gather + scatter, no per-block python loop
                tiles = lf_plane[lfy, lfx][:, None, None]
                pix = transform_to_pixels_batch(np, tid, tiles, dq[sel, c])
                ph, pw = pix.shape[1], pix.shape[2]
                if ph == BLOCK_DIM and pw == BLOCK_DIM:
                    oh, ow = outp.shape
                    v = outp.reshape(oh // BLOCK_DIM, BLOCK_DIM, ow // BLOCK_DIM, BLOCK_DIM)
                    v[lfy, :, lfx, :] = pix
                    continue
                for i, (x, y) in enumerate(zip(lfx.tolist(), lfy.tolist())):
                    outp[y * BLOCK_DIM : y * BLOCK_DIM + ph, x * BLOCK_DIM : x * BLOCK_DIM + pw] = pix[i]
                continue
            tiles = np.stack(
                [
                    lf_plane[y : y + cy, x : x + cx]
                    for x, y in zip(lfx.tolist(), lfy.tolist())
                ]
            )
            pix = transform_to_pixels_batch(np, tid, tiles, dq[sel, c])
            ph, pw = pix.shape[1], pix.shape[2]
            for i, (x, y) in enumerate(zip(lfx.tolist(), lfy.tolist())):
                outp[y * BLOCK_DIM : y * BLOCK_DIM + ph, x * BLOCK_DIM : x * BLOCK_DIM + pw] = pix[i]
