"""VarDCT HF group decode: per-block nonzero prediction, coefficient rANS
decode in coded order, cross-pass accumulation, dequant with CfL and
quant-bias, and inverse transform to pixels.

Capability reference: jxl/src/frame/group.rs. This host-oracle version
keeps the numeric part (dequant + IDCT) in numpy with device-identical
structure; the entropy loop is the part the native/Pallas path replaces.
"""

from __future__ import annotations

import numpy as np

from ..entropy import SymbolReader
from ..errors import InvalidBitstream
from ..io.bit_reader import BitReader
from .block_context import zero_density_context
from .cfl import COLOR_TILE_DIM_IN_BLOCKS
from .transform_map import (
    block_shape_id,
    covered_blocks_x,
    covered_blocks_y,
)
from .transforms import coeff_storage_shape, transform_to_pixels

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
    """ref group.rs:85-97: small values get per-channel bias, others the
    reciprocal correction."""
    q = quant.astype(np.float32)
    with np.errstate(divide="ignore", invalid="ignore"):
        adjusted = np.where(quant == 0, 0.0, q - np.float32(biases[3]) / q)
    return np.where(np.abs(quant) < 2, q * np.float32(biases[c]), adjusted).astype(
        np.float32
    )


def decode_vardct_group(frame, group: int, pass_readers: list) -> None:
    header = frame.header
    lf_global = frame.lf_global
    hf_global = frame.hf_global
    hf = frame.hf_meta
    ensure_pixel_buffers(frame)

    x_dm_multiplier = (1.0 / 1.25) ** (header.x_qm_scale - 2.0)
    b_dm_multiplier = (1.0 / 1.25) ** (header.b_qm_scale - 2.0)

    (gx0, gy0), (gw, gh) = header.block_group_rect(group)
    hshift = [header.hshift(c) for c in range(3)]
    vshift = [header.vshift(c) for c in range(3)]

    # per-pass state
    num_histo_bits = _ceil_log2(hf_global.num_histograms)
    passes = []
    for pass_idx, br in pass_readers:
        histogram_index = br.read(num_histo_bits)
        if histogram_index >= hf_global.num_histograms:
            raise InvalidBitstream("invalid histogram index")
        reader = SymbolReader(hf_global.passes[pass_idx].histograms, br)
        shift = (
            header.passes.shift[pass_idx]
            if pass_idx < len(header.passes.shift)
            else 0
        )
        num_nzeros = [
            [[0] * (gw >> hshift[c]) for _ in range(gh >> vshift[c])] for c in range(3)
        ]
        passes.append(
            dict(
                pass_idx=pass_idx,
                br=br,
                reader=reader,
                histogram_index=histogram_index,
                shift=shift,
                num_nzeros=num_nzeros,
            )
        )

    ccp = lf_global.color_correlation_params
    qp = lf_global.quant_params
    inv_global_scale = qp.inv_global_scale
    bctx = lf_global.block_context_map
    quant_biases = frame.file_header.transform_data.opsin_inverse_matrix.quant_biases
    dqm = hf_global.dequant_matrices

    # coefficient accumulators (multi-pass keeps them per group)
    multipass = header.passes.num_passes > 1
    if multipass and group in hf_global.hf_coefficients:
        coeffs = hf_global.hf_coefficients[group]
    else:
        coeffs = np.zeros((3, GROUP_DIM * GROUP_DIM), dtype=np.int32)
        if multipass:
            hf_global.hf_coefficients[group] = coeffs

    tmap = hf["transform"]
    rqmap = hf["raw_quant"]
    qlfmap = hf["quant_lf"]
    ytox = hf["ytox"]
    ytob = hf["ytob"]

    coeffs_offset = 0
    for by in range(gh):
        gby = gy0 + by
        ty = (gy0 + by) // COLOR_TILE_DIM_IN_BLOCKS
        for bx in range(gw):
            gbx = gx0 + bx
            raw_tid = int(tmap[gby, gbx])
            tid = raw_tid & 127
            if raw_tid < 128:
                continue  # not the first block of its transform
            tx = (gx0 + bx) // COLOR_TILE_DIM_IN_BLOCKS
            x_cc_mul = ccp.y_to_x(int(ytox[ty, tx]))
            b_cc_mul = ccp.y_to_b(int(ytob[ty, tx]))
            raw_quant = int(rqmap[gby, gbx])
            quant_lf = int(qlfmap[gby, gbx])
            cx = covered_blocks_x(tid)
            cy = covered_blocks_y(tid)
            shape_id = block_shape_id(tid)
            num_blocks = cx * cy
            num_coeffs = num_blocks * BLOCK_SIZE
            log_num_blocks = num_blocks.bit_length() - 1
            sbx = [bx >> hshift[c] for c in range(3)]
            sby = [by >> vshift[c] for c in range(3)]

            for p in passes:
                reader = p["reader"]
                br = p["br"]
                pstate = hf_global.passes[p["pass_idx"]]
                histograms = pstate.histograms
                ctx_off = p["histogram_index"] * bctx.num_ac_contexts
                shift = p["shift"]
                for c in (1, 0, 2):
                    if (sbx[c] << hshift[c]) != bx or (sby[c] << vshift[c]) != by:
                        continue
                    nz = p["num_nzeros"][c]
                    predicted = _predict_num_nonzeros(nz, sbx[c], sby[c])
                    block_context = bctx.block_context(quant_lf, raw_quant, shape_id, c)
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
                    base = coeffs_offset
                    for k in range(num_blocks, num_coeffs):
                        if nonzeros == 0:
                            break
                        ctx = histo_off + zero_density_context(
                            nonzeros, k, log_num_blocks, prev
                        )
                        coeff = reader.read_signed(histograms, br, ctx) << shift
                        prev = 1 if coeff != 0 else 0
                        nonzeros -= prev
                        cbuf[base + order[k]] += coeff
                    if nonzeros != 0:
                        raise InvalidBitstream("end-of-block residual nonzeros")

            # numeric part: dequant + CfL + IDCT (last pass / full decode)
            if frame.render_after_decode:
                _dequant_and_idct(
                    frame, tid, coeffs, coeffs_offset, num_coeffs,
                    inv_global_scale, raw_quant, x_dm_multiplier, b_dm_multiplier,
                    x_cc_mul, b_cc_mul, quant_biases, dqm,
                    gbx, gby, bx, by, sbx, sby, hshift, vshift, cx, cy,
                )
            coeffs_offset += num_coeffs

    for p in passes:
        p["reader"].check_final_state(
            hf_global.passes[p["pass_idx"]].histograms, p["br"]
        )


def _dequant_and_idct(
    frame, tid, coeffs, off, num_coeffs, inv_global_scale, raw_quant,
    x_dm_mul, b_dm_mul, x_cc_mul, b_cc_mul, biases, dqm,
    gbx, gby, bx, by, sbx, sby, hshift, vshift, cx, cy,
):
    scaled_dequant_y = inv_global_scale / raw_quant
    scaled = [
        scaled_dequant_y * x_dm_mul,
        scaled_dequant_y,
        scaled_dequant_y * b_dm_mul,
    ]
    qblocks = [coeffs[c][off : off + num_coeffs] for c in range(3)]
    dq = []
    for c in range(3):
        mat = dqm.matrix(tid, c)[:num_coeffs]
        dq.append(adjust_quant_bias(qblocks[c], c, biases) * mat * np.float32(scaled[c]))
    # CfL: x and b get a multiple of dequantized y
    dq[0] = dq[0] + np.float32(x_cc_mul) * dq[1]
    dq[2] = dq[2] + np.float32(b_cc_mul) * dq[1]

    for c in (1, 0, 2):
        if (sbx[c] << hshift[c]) != bx or (sby[c] << vshift[c]) != by:
            continue
        lfx = gbx >> hshift[c]
        lfy = gby >> vshift[c]
        lf_tile = frame.lf_image[c][lfy : lfy + cy, lfx : lfx + cx]
        pix = transform_to_pixels(tid, lf_tile, dq[c])
        py0 = lfy * BLOCK_DIM
        px0 = lfx * BLOCK_DIM
        out = frame.vardct_pixels[c]
        ph, pw = pix.shape
        out[py0 : py0 + ph, px0 : px0 + pw] = pix
