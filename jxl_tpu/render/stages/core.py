"""Render pipeline stage math, array-module generic (numpy or jax.numpy).

Every function takes whole planes (or planes + halo) and is written with
shifted-slice arithmetic only — no data-dependent control flow — so the
exact same code traces under jit and runs inside shard_map on a TPU mesh.

Capability reference: jxl/src/render/stages/{gaborish,epf/*,
chroma_upsample,upsample}.rs and features/epf.rs.
"""

from __future__ import annotations

import numpy as np

BLOCK_DIM = 8
MIN_SIGMA = -3.90524291751269967465540850526868
INV_SIGMA_NUM = -1.1715728752538099024


def _pad_mirror(xp, plane, by, bx):
    """Mirror-with-edge-duplication padding (ref util/mirror.rs)."""
    if by == 0 and bx == 0:
        return plane
    if xp is np:
        return np.pad(plane, ((by, by), (bx, bx)), mode="symmetric")
    import jax.numpy as jnp

    return jnp.pad(plane, ((by, by), (bx, bx)), mode="symmetric")


def gaborish(xp, plane, weight1: float, weight2: float):
    """3x3 Gabor-like blur, self-normalized (ref stages/gaborish.rs)."""
    total = 1.0 + weight1 * 4.0 + weight2 * 4.0
    w0 = np.float32(1.0 / total)
    w1 = np.float32(weight1 / total)
    w2 = np.float32(weight2 / total)
    p = _pad_mirror(xp, plane, 1, 1)
    c = p[1:-1, 1:-1]
    side = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    corner = p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]
    return c * w0 + side * w1 + corner * w2


# -- EPF ---------------------------------------------------------------------

_PLUS5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))
_EPF0_NEIGHBORS = (
    (-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
    (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0),
)
_EPF1_NEIGHBORS = ((-1, 0), (0, -1), (0, 1), (1, 0))


def compute_sigma_image(frame) -> np.ndarray:
    """Per-block 1/sigma (ref features/epf.rs SigmaSource)."""
    rf = frame.header.restoration_filter
    from ...io.headers.frame import Encoding

    if frame.header.encoding != Encoding.VARDCT:
        return None  # constant handled by caller
    hf = frame.hf_meta
    qp = frame.lf_global.quant_params
    quant_scale = 1.0 / qp.inv_global_scale
    raw_quant = hf["raw_quant"].astype(np.float32)
    sigma_quant = rf.epf_quant_mul / (quant_scale * raw_quant * INV_SIGMA_NUM)
    lut = np.array(rf.epf_sharp_lut, dtype=np.float32)
    sigma = sigma_quant * lut[hf["epf"]]
    sigma = np.minimum(sigma, -1e-4)
    return (1.0 / sigma).astype(np.float32)


def _sad_mul_mask(xp, h, w, y0, x0, sm, bsm):
    """Per-pixel sigma multiplier: bsm on 8x8-block borders (ref epf/common.rs).

    Computed with xp so that under jit it lowers to iota + select (a fused
    device op) instead of an embedded h*w constant."""
    ys = (xp.arange(h) + y0) % BLOCK_DIM
    xs = (xp.arange(w) + x0) % BLOCK_DIM
    ybord = (ys == 0) | (ys == BLOCK_DIM - 1)
    xbord = (xs == 0) | (xs == BLOCK_DIM - 1)
    border = ybord[:, None] | xbord[None, :]
    return xp.where(border, np.float32(bsm), np.float32(sm))


def _epf_generic(xp, planes, inv_sigma_px, sad_mul, neighbors, sad_pattern, channel_scale, border):
    """Shared EPF machinery: weights from SADs, normalized neighbor blend.

    planes: list of 3 (h, w); inv_sigma_px: per-pixel stored 1/sigma;
    returns filtered planes.
    """
    h, w = planes[0].shape
    padded = [_pad_mirror(xp, p, border, border) for p in planes]

    def at(p, dy, dx):
        return p[border + dy : border + dy + h, border + dx : border + dx + w]

    inv_sigma = inv_sigma_px * sad_mul
    # SAD(n) over a shifted pattern reuses one |I - shift(I, n)| plane per
    # neighbor: the pattern points are shifted views of the same diff
    # (5x fewer abs-diffs than the naive (neighbor, pattern) double loop)
    r = max(max(abs(py), abs(px)) for (py, px) in sad_pattern)
    sads = []
    for (ny, nx) in neighbors:
        sad = None
        for c, p in enumerate(padded):
            cs = np.float32(channel_scale[c])
            a = p[border - r : border + r + h, border - r : border + r + w]
            b = p[
                border - r + ny : border + r + ny + h,
                border - r + nx : border + r + nx + w,
            ]
            diff = xp.abs(a - b)
            s = None
            for (py, px) in sad_pattern:
                d = diff[r + py : r + py + h, r + px : r + px + w]
                s = d if s is None else s + d
            term = s * cs
            sad = term if sad is None else sad + term
        sads.append(sad)

    one = np.float32(1.0)
    weights = [xp.maximum(s * inv_sigma + one, 0.0) for s in sads]
    wsum = one + sum(weights)
    out = []
    passthrough = inv_sigma_px < np.float32(MIN_SIGMA)
    for p in padded:
        acc = at(p, 0, 0)
        for wgt, (ny, nx) in zip(weights, neighbors):
            acc = acc + wgt * at(p, ny, nx)
        filtered = acc / wsum
        out.append(xp.where(passthrough, at(p, 0, 0), filtered))
    return out


def epf_step(xp, planes, sigma_block, frame_rf, step: int, pos=(0, 0), constant_sigma=None):
    """EPF iteration `step` in {0,1,2} (ref stages/epf/epf{0,1,2}.rs)."""
    h, w = planes[0].shape
    if sigma_block is not None:
        inv_sigma_px = _expand_sigma(xp, sigma_block, h, w, pos)
    else:
        inv_sigma_px = xp.full((h, w), np.float32(constant_sigma))
    return epf_step_px(xp, planes, inv_sigma_px, frame_rf, step, pos)


def epf_step_px(xp, planes, inv_sigma_px, frame_rf, step: int, pos=(0, 0)):
    """EPF iteration with a precomputed per-pixel 1/sigma map."""
    h, w = planes[0].shape
    if step == 0:
        sigma_scale = frame_rf.epf_pass0_sigma_scale
        neighbors, pattern, border = _EPF0_NEIGHBORS, _PLUS5, 3
    elif step == 1:
        sigma_scale = 1.0
        neighbors, pattern, border = _EPF1_NEIGHBORS, _PLUS5, 2
    else:
        sigma_scale = frame_rf.epf_pass2_sigma_scale
        neighbors, pattern, border = _EPF1_NEIGHBORS, ((0, 0),), 1

    sm = sigma_scale * 1.65
    bsm = sm * frame_rf.epf_border_sad_mul
    sad_mul = _sad_mul_mask(xp, h, w, pos[1], pos[0], sm, bsm)
    return _epf_generic(
        xp, planes, inv_sigma_px, sad_mul, neighbors, pattern,
        frame_rf.epf_channel_scale, border,
    )


def _expand_sigma(xp, sigma_block, h, w, pos):
    x0, y0 = pos
    by0 = y0 // BLOCK_DIM
    bx0 = x0 // BLOCK_DIM
    nby = -(-(y0 + h) // BLOCK_DIM) - by0
    nbx = -(-(x0 + w) // BLOCK_DIM) - bx0
    blk = sigma_block[by0 : by0 + nby, bx0 : bx0 + nbx]
    px = xp.repeat(xp.repeat(blk, BLOCK_DIM, 0), BLOCK_DIM, 1)
    oy = y0 - by0 * BLOCK_DIM
    ox = x0 - bx0 * BLOCK_DIM
    return px[oy : oy + h, ox : ox + w]


# -- chroma upsampling ----------------------------------------------------------


def chroma_upsample_h(xp, plane):
    """Horizontal 2x: out pairs (0.25 prev + 0.75 cur, 0.75 cur + 0.25 next)."""
    p = _pad_mirror(xp, plane, 0, 1)
    cur = p[:, 1:-1]
    left = p[:, :-2] * np.float32(0.25) + cur * np.float32(0.75)
    right = p[:, 2:] * np.float32(0.25) + cur * np.float32(0.75)
    h, w = plane.shape
    out = xp.stack([left, right], axis=-1).reshape(h, 2 * w)
    return out


def chroma_upsample_v(xp, plane):
    p = _pad_mirror(xp, plane, 1, 0)
    cur = p[1:-1, :]
    up = p[:-2, :] * np.float32(0.25) + cur * np.float32(0.75)
    down = p[2:, :] * np.float32(0.25) + cur * np.float32(0.75)
    h, w = plane.shape
    out = xp.stack([up, down], axis=1).reshape(2 * h, w)
    return out


# -- N-x upsampling --------------------------------------------------------------


def build_upsample_kernels(weights, n: int) -> np.ndarray:
    """(N, N, 5, 5) kernels from packed triangular weights (ref upsample.rs)."""
    kernel = np.zeros((n, n, 5, 5), dtype=np.float32)
    half = n // 2
    for i in range(5 * half):
        for j in range(5 * half):
            y, x = min(i, j), max(i, j)
            index = 5 * half * y - y * (y - 1) // 2 + x - y
            v = weights[index]
            kernel[j // 5, i // 5, j % 5, i % 5] = v
            kernel[(n - 1) - j // 5, i // 5, 4 - (j % 5), i % 5] = v
            kernel[j // 5, (n - 1) - i // 5, j % 5, 4 - (i % 5)] = v
            kernel[(n - 1) - j // 5, (n - 1) - i // 5, 4 - (j % 5), 4 - (i % 5)] = v
    return kernel


def upsample(xp, plane, kernels: np.ndarray, n: int, prepadded: bool = False):
    """N-x upsampling: per-output-phase 5x5 conv, clamped to the local 5x5
    min/max (ref upsample.rs). With `prepadded`, `plane` already carries a
    2-pixel border (real neighbor data, e.g. adjacent LF groups)."""
    if prepadded:
        p = plane
        h, w = plane.shape[0] - 4, plane.shape[1] - 4
    else:
        h, w = plane.shape
        p = _pad_mirror(xp, plane, 2, 2)
    # gather the 25 shifted views: shape (5,5,h,w)
    views = [[p[dy : dy + h, dx : dx + w] for dx in range(5)] for dy in range(5)]
    stack = xp.stack([xp.stack(row, 0) for row in views], 0)  # (5,5,h,w)
    mins = xp.min(stack, axis=(0, 1))
    maxs = xp.max(stack, axis=(0, 1))
    # output[y*n+oy, x*n+ox] = clamp(kernel[oy,ox] . 5x5 neighborhood of (y,x))
    # One einsum over all phases: (n,n,5,5) x (5,5,h,w) -> (n,n,h,w);
    # on TPU this contraction maps onto the MXU.
    acc = xp.einsum("abij,ijhw->abhw", xp.asarray(kernels), stack)
    acc = xp.clip(acc, mins[None, None], maxs[None, None])
    return acc.transpose(2, 0, 3, 1).reshape(h * n, w * n)


# -- output pixel-format conversion ------------------------------------------------

_DITHER = None


def dither_table() -> np.ndarray:
    """32x32 blue-noise dither pattern (public data from
    momentsingraphics.de/BlueNoise.html, as used by ref convert.rs:14-18)."""
    global _DITHER
    if _DITHER is None:
        import os

        _DITHER = np.load(os.path.join(os.path.dirname(__file__), "dither_table.npy"))
    return _DITHER


def f32_to_u8(xp, plane, bit_depth: int = 8, channel: int = 0, pos=(0, 0)):
    """ConvertF32ToU8: scale, blue-noise dither, clamp, round
    (ref stages/convert.rs:549-607). Dither indices computed with xp so the
    table lowers to a 1K-entry gather under jit, not an HxW constant."""
    h, w = plane.shape
    maxv = np.float32((1 << bit_depth) - 1)
    if xp is np and isinstance(plane, np.ndarray):
        from ... import native

        out = native.dither_u8_native(
            plane,
            dither_table(),
            (pos[1] + 13 * channel) % 32,
            (pos[0] + 23 * channel) % 32,
            float(maxv),
        )
        if out is not None:
            return out
    tab = xp.asarray(dither_table().reshape(-1))
    ys = (xp.arange(h) + (pos[1] + 13 * channel)) % 32
    xs = (xp.arange(w) + (pos[0] + 23 * channel)) % 32
    idx = ys[:, None] * 32 + xs[None, :]
    dith = xp.take(tab, idx)
    out = xp.clip(plane * maxv + dith, np.float32(0.0), maxv)
    return xp.round(out).astype(np.uint8)


def f32_to_u16(xp, plane, bit_depth: int = 16):
    """ConvertF32ToU16: clamp to [0,1], scale, round (ref convert.rs:738-760)."""
    maxv = np.float32((1 << bit_depth) - 1)
    out = xp.clip(plane, np.float32(0.0), np.float32(1.0)) * maxv
    return xp.round(out).astype(np.uint16)


def f32_to_f16(xp, plane):
    """ConvertF32ToF16 with clamp to the f16 range (ref convert.rs:790-)."""
    lim = np.float32(65504.0)
    return xp.clip(plane, -lim, lim).astype(np.float16)


def convert_output(xp, plane, fmt: str, channel: int = 0, bit_depth: int | None = None):
    if fmt == "f32":
        return plane
    if fmt == "u8":
        return f32_to_u8(xp, plane, bit_depth or 8, channel)
    if fmt == "u16":
        return f32_to_u16(xp, plane, bit_depth or 16)
    if fmt == "f16":
        return f32_to_f16(xp, plane)
    raise ValueError(f"unknown pixel format {fmt!r}")
