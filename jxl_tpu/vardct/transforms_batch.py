"""Batched inverse VarDCT transforms: (N, ...) blocks of one type at a time.

Same math as transforms.py (the per-block oracle), formulated over a
leading batch axis so the whole group's blocks of each transform type run
as a few einsums — the exact shape the TPU device path consumes (batched
matmuls on the MXU). Works with numpy or jax.numpy via the xp argument.
"""

from __future__ import annotations

import numpy as np

from .transform_map import HfTransformType as T, covered_blocks_x, covered_blocks_y
from .transforms import coeff_storage_shape, dct_matrix, dct_scales, idct_matrix, pixel_shape
from ._afv_basis import AFV4X4BASIS

_AFV_BASIS = np.array(AFV4X4BASIS, dtype=np.float32).reshape(16, 16)


def idct2d_batch(xp, coeffs, rows: int, cols: int):
    """(N, rows*cols) flat coefficient buffers -> (N, rows, cols) pixels."""
    n = coeffs.shape[0]
    if rows < cols:
        t = coeffs.reshape(n, rows, cols).transpose(0, 2, 1)
    else:
        t = coeffs.reshape(n, cols, rows)
    a1 = xp.asarray(idct_matrix(t.shape[1]))
    a2 = xp.asarray(idct_matrix(t.shape[2]))
    if xp is np:
        # numpy's c_einsum never touches BLAS; batched matmuls hit gemm
        # with native transpose flags and skip the big layout copies the
        # flattened two-gemm formulation needed (2-4x on large blocks)
        s1 = np.matmul(a1, t)  # (n, d1, d2)
        return np.matmul(a2, s1.transpose(0, 2, 1))  # (n, d2, d1)
    step1 = xp.einsum("yu,nux->nyx", a1, t)
    return xp.einsum("yu,nxu->nyx", a2, step1)


def reinterpreting_dct_batch(xp, lf):
    """(N, a, b) LF tiles -> (N, min, max) scaled DCT coefficients."""
    n, a, b = lf.shape
    d1 = xp.einsum("uy,nyx->nux", xp.asarray(dct_matrix(a)), lf)
    d2 = xp.einsum("uy,nxy->nxu", xp.asarray(dct_matrix(b)), d1).transpose(0, 2, 1)
    # d2: (n, b, a)
    if a < b:
        res = d2.transpose(0, 2, 1)  # (n, a, b)
        res = res / (dct_scales(a)[None, :, None] * dct_scales(b)[None, None, :])
    else:
        res = d2
        res = res / (dct_scales(b)[None, :, None] * dct_scales(a)[None, None, :])
    return res


def _idct4_sq_batch(xp, c):
    """(N, 4, 4) coefficients -> (N, 4, 4) pixels (slow_idct2d square)."""
    a = xp.asarray(idct_matrix(4))
    return xp.einsum("yu,nxu->nyx", a, xp.einsum("yu,nux->nyx", a, c))


def _idct2_top_block_batch(xp, s, block):
    out = block.copy() if xp is np else block
    n = s // 2
    c00 = block[:, :n, :n]
    c01 = block[:, :n, n : 2 * n]
    c10 = block[:, n : 2 * n, :n]
    c11 = block[:, n : 2 * n, n : 2 * n]
    r00 = c00 + c01 + c10 + c11
    r01 = c00 + c01 - c10 - c11
    r10 = c00 - c01 + c10 - c11
    r11 = c00 - c01 - c10 + c11
    if xp is np:
        out[:, 0 : 2 * n : 2, 0 : 2 * n : 2] = r00
        out[:, 0 : 2 * n : 2, 1 : 2 * n : 2] = r01
        out[:, 1 : 2 * n : 2, 0 : 2 * n : 2] = r10
        out[:, 1 : 2 * n : 2, 1 : 2 * n : 2] = r11
        return out
    out = out.at[:, 0 : 2 * n : 2, 0 : 2 * n : 2].set(r00)
    out = out.at[:, 0 : 2 * n : 2, 1 : 2 * n : 2].set(r01)
    out = out.at[:, 1 : 2 * n : 2, 0 : 2 * n : 2].set(r10)
    out = out.at[:, 1 : 2 * n : 2, 1 : 2 * n : 2].set(r11)
    return out


_LINMAT_CACHE: dict = {}
# Dense single-sgemm path only for small blocks: at >=256 pixels the
# separable two-sgemm formulation in _transform_to_pixels_impl wins
# (32x32: 3.7x measured — dense is O(px^2) per block, separable O(px^1.5))
_LINMAT_MAX_PIXELS = 255


def transform_to_pixels_batch(xp, t: int, lf, coeffs):
    """Batched inverse transform for one type.

    lf: (N, cy, cx) f32; coeffs: (N, num_coeffs) f32 (dequantized).
    Returns (N, rows, cols) pixels.

    Host fast path: every inverse transform here is LINEAR in
    (coeffs, lf), so for block sizes up to 32x32 the whole transform
    collapses to one dense map `pixels = coeffs @ A + lf @ B`. A and B
    are built once per type by pushing basis vectors through the generic
    implementation below (so DC-replacement/layout are exactly the
    oracle's), and each bucket then runs as a single BLAS sgemm — ~20x
    the einsum formulation for 8x8 blocks.
    """
    rows, cols = pixel_shape(t)
    if xp is np and rows * cols <= _LINMAT_MAX_PIXELS and coeffs.shape[0] > 2:
        n = coeffs.shape[0]
        key = (int(t), coeffs.shape[1], lf.shape[1], lf.shape[2])
        AB = _LINMAT_CACHE.get(key)
        if AB is None:
            nc = coeffs.shape[1]
            nl = lf.shape[1] * lf.shape[2]
            A = _transform_to_pixels_impl(
                np, t,
                np.zeros((nc, lf.shape[1], lf.shape[2]), np.float32),
                np.eye(nc, dtype=np.float32),
            ).reshape(nc, rows * cols)
            B = _transform_to_pixels_impl(
                np, t,
                np.eye(nl, dtype=np.float32).reshape(nl, lf.shape[1], lf.shape[2]),
                np.zeros((nl, nc), np.float32),
            ).reshape(nl, rows * cols)
            AB = (np.ascontiguousarray(A), np.ascontiguousarray(B))
            _LINMAT_CACHE[key] = AB
        A, B = AB
        out = coeffs.astype(np.float32, copy=False) @ A
        out += lf.reshape(n, -1).astype(np.float32, copy=False) @ B
        return out.reshape(n, rows, cols)
    return _transform_to_pixels_impl(xp, t, lf, coeffs)


def _transform_to_pixels_impl(xp, t: int, lf, coeffs):
    n = coeffs.shape[0]
    rows, cols = pixel_shape(t)

    if t == T.DCT:
        buf = coeffs.copy() if xp is np else coeffs
        if xp is np:
            buf[:, 0] = lf[:, 0, 0]
        else:
            buf = buf.at[:, 0].set(lf[:, 0, 0])
        return idct2d_batch(xp, buf, 8, 8)

    if t in (T.AFV0, T.AFV1, T.AFV2, T.AFV3):
        return _afv_batch(xp, int(t) - int(T.AFV0), lf, coeffs)

    if t in (T.IDENTITY, T.DCT2X2, T.DCT4X4, T.DCT8X4, T.DCT4X8):
        c = coeffs.reshape(n, 8, 8)
        c = c.copy() if xp is np else c
        if xp is np:
            c[:, 0, 0] = lf[:, 0, 0]
        else:
            c = c.at[:, 0, 0].set(lf[:, 0, 0])
        if t == T.DCT2X2:
            c = _idct2_top_block_batch(xp, 2, c)
            c = _idct2_top_block_batch(xp, 4, c)
            return _idct2_top_block_batch(xp, 8, c)
        if t == T.DCT4X4:
            dcs = _corner_dcs4(xp, c)
            out = xp.zeros((n, 8, 8), dtype=coeffs.dtype) if xp is np else None
            quads = []
            for y in range(2):
                rowq = []
                for x in range(2):
                    blk = c[:, y::2, x::2]
                    blk = blk.copy() if xp is np else blk
                    if xp is np:
                        blk[:, 0, 0] = dcs[y * 2 + x]
                    else:
                        blk = blk.at[:, 0, 0].set(dcs[y * 2 + x])
                    rowq.append(_idct4_sq_batch(xp, blk))
                quads.append(rowq)
            return _assemble_quads(xp, quads, n, coeffs.dtype)
        if t in (T.DCT8X4, T.DCT4X8):
            dcs = [c[:, 0, 0] + c[:, 1, 0], c[:, 0, 0] - c[:, 1, 0]]
            outs = []
            for k in range(2):
                blk = c[:, k::2, :]
                blk = blk.copy() if xp is np else blk
                if xp is np:
                    blk[:, 0, 0] = dcs[k]
                else:
                    blk = blk.at[:, 0, 0].set(dcs[k])
                if t == T.DCT8X4:
                    outs.append(idct2d_batch(xp, blk.reshape(n, 32), 8, 4))
                else:
                    outs.append(idct2d_batch(xp, blk.reshape(n, 32), 4, 8))
            if t == T.DCT8X4:
                return xp.concatenate(outs, axis=2)
            return xp.concatenate(outs, axis=1)
        # IDENTITY
        return _identity_batch(xp, c, n, coeffs.dtype)

    # general large DCT with reinterpreting LF
    srows, scols = coeff_storage_shape(t)
    buf = coeffs.reshape(n, srows, scols)
    buf = buf.copy() if xp is np else buf
    lfc = reinterpreting_dct_batch(xp, lf.astype(np.float32) if xp is np else lf)
    if xp is np:
        buf[:, : lfc.shape[1], : lfc.shape[2]] = lfc
    else:
        buf = buf.at[:, : lfc.shape[1], : lfc.shape[2]].set(lfc)
    return idct2d_batch(xp, buf.reshape(n, srows * scols), rows, cols)


def _corner_dcs4(xp, c):
    b00, b01, b10, b11 = c[:, 0, 0], c[:, 0, 1], c[:, 1, 0], c[:, 1, 1]
    return [b00 + b01 + b10 + b11, b00 + b01 - b10 - b11,
            b00 - b01 + b10 - b11, b00 - b01 - b10 + b11]


def _assemble_quads(xp, quads, n, dtype):
    top = xp.concatenate([quads[0][0], quads[0][1]], axis=2)
    bottom = xp.concatenate([quads[1][0], quads[1][1]], axis=2)
    return xp.concatenate([top, bottom], axis=1)


def _identity_batch(xp, c, n, dtype):
    """Batched Hornuss (ref transform.rs:528-569)."""
    dcs = _corner_dcs4(xp, c)
    out = xp.zeros((n, 8, 8), dtype=dtype)
    for y in range(2):
        for x in range(2):
            block_dc = dcs[y * 2 + x]
            rs = None
            for iy in range(4):
                for ix in range(4):
                    if ix == 0 and iy == 0:
                        continue
                    v = c[:, y + iy * 2, x + ix * 2]
                    rs = v if rs is None else rs + v
            center = block_dc - rs * np.float32(1.0 / 16.0)
            sub = c[:, y::2, x::2] + center[:, None, None]
            corner = c[:, y + 2, x + 2] + center
            if xp is np:
                out[:, y * 4 : y * 4 + 4, x * 4 : x * 4 + 4] = sub
                out[:, 4 * y + 1, 4 * x + 1] = center
                out[:, y * 4, x * 4] = corner
            else:
                out = out.at[:, y * 4 : y * 4 + 4, x * 4 : x * 4 + 4].set(sub)
                out = out.at[:, 4 * y + 1, 4 * x + 1].set(center)
                out = out.at[:, y * 4, x * 4].set(corner)
    return out


def _afv_batch(xp, afv_kind, lf, coeffs):
    n = coeffs.shape[0]
    c = coeffs.reshape(n, 8, 8)
    c = c.copy() if xp is np else c
    if xp is np:
        c[:, 0, 0] = lf[:, 0, 0]
    else:
        c = c.at[:, 0, 0].set(lf[:, 0, 0])
    afv_x = afv_kind & 1
    afv_y = afv_kind // 2
    b00, b01, b10 = c[:, 0, 0], c[:, 0, 1], c[:, 1, 0]
    dcs = [(b00 + b10 + b01) * 4.0, b00 + b10 - b01, b00 - b10]

    pixels = xp.zeros((n, 8, 8), dtype=coeffs.dtype)

    cc = c[:, 0:8:2, 0:8:2]
    cc = cc.copy() if xp is np else cc
    if xp is np:
        cc[:, 0, 0] = dcs[0]
    else:
        cc = cc.at[:, 0, 0].set(dcs[0])
    block = xp.einsum("nj,ji->ni", cc.reshape(n, 16), xp.asarray(_AFV_BASIS)).reshape(n, 4, 4)
    if afv_y == 1:
        block = block[:, ::-1, :]
    if afv_x == 1:
        block = block[:, :, ::-1]
    pixels = _set_region(xp, pixels, block, afv_y * 4, afv_x * 4)

    cd = c[:, 0:8:2, 1:8:2]
    cd = cd.copy() if xp is np else cd
    if xp is np:
        cd[:, 0, 0] = dcs[1]
    else:
        cd = cd.at[:, 0, 0].set(dcs[1])
    blk = _idct4_sq_batch(xp, cd)
    pixels = _set_region(xp, pixels, blk, afv_y * 4, (1 - afv_x) * 4)

    ce = c[:, 1:8:2, :]
    ce = ce.copy() if xp is np else ce
    if xp is np:
        ce[:, 0, 0] = dcs[2]
    else:
        ce = ce.at[:, 0, 0].set(dcs[2])
    blk = idct2d_batch(xp, ce.reshape(n, 32), 4, 8)
    pixels = _set_region(xp, pixels, blk, (1 - afv_y) * 4, 0)
    return pixels


def _set_region(xp, dst, src, y0, x0):
    h, w = src.shape[1], src.shape[2]
    if xp is np:
        dst[:, y0 : y0 + h, x0 : x0 + w] = src
        return dst
    return dst.at[:, y0 : y0 + h, x0 : x0 + w].set(src)
