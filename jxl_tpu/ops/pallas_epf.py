"""Pallas TPU kernel: the full restoration-filter chain (gaborish +
EPF0/1/2) as ONE kernel — one HBM read and one HBM write per pixel.

The chain is memory-bound: under plain XLA each stage materializes its
output to HBM (4+ round trips over 3 full planes). This kernel streams
row bands through VMEM with a 7-pixel halo (1 gaborish + 3 epf0 + 2 epf1
+ 1 epf2 = the same border math as the reference's
`border_pixels_per_stage`, low_memory_pipeline/mod.rs:184-200) and runs
every stage on the band while it is resident.

Grid: one program per (row band, column tile). The padded planes stay in
HBM; each program DMAs its (band + 2*halo, ctile + 2*halo) slice into
VMEM scratch, computes the valid interior, and writes its tile through a
blocked out_spec. Column tiling caps VMEM on wide images.

Capability reference: jxl/src/render/stages/{gaborish.rs,epf/*.rs}; the
math matches render/stages/core.py (the jnp/oracle path) exactly.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# filter border is 7 (gaborish 1 + epf0 3 + epf1 2 + epf2 1); use 8 so DMA
# row offsets and tile heights stay aligned to the f32 (8, 128) VMEM tiling
HALO = 8
MIN_SIGMA = np.float32(-3.90524291751269967465540850526868)
BLOCK_DIM = 8

_EPF0_NEIGHBORS = (
    (-2, 0), (-1, -1), (-1, 0), (-1, 1), (0, -2), (0, -1),
    (0, 1), (0, 2), (1, -1), (1, 0), (1, 1), (2, 0),
)
_EPF1_NEIGHBORS = ((-1, 0), (0, -1), (0, 1), (1, 0))
_PLUS5 = ((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1))


def _gab_valid(p, w1: float, w2: float):
    """Gaborish on a pre-padded tile: consumes a 1-px border."""
    total = 1.0 + w1 * 4.0 + w2 * 4.0
    c0 = np.float32(1.0 / total)
    c1 = np.float32(w1 / total)
    c2 = np.float32(w2 / total)
    c = p[1:-1, 1:-1]
    side = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    corner = p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]
    return c * c0 + side * c1 + corner * c2


def _epf_valid(chans, inv_sigma_tile, step: int, cfg, y0, x0):
    """One EPF iteration on pre-padded tiles: consumes `border` pixels.

    chans/inv_sigma_tile share the same origin; y0/x0 are the absolute
    image coordinates of tile element (0, 0) (traced values are fine —
    they only feed the 8x8-border sad_mul mask).
    """
    if step == 0:
        sigma_scale, neighbors, pattern, border = cfg.pass0_scale, _EPF0_NEIGHBORS, _PLUS5, 3
    elif step == 1:
        sigma_scale, neighbors, pattern, border = 1.0, _EPF1_NEIGHBORS, _PLUS5, 2
    else:
        sigma_scale, neighbors, pattern, border = cfg.pass2_scale, _EPF1_NEIGHBORS, ((0, 0),), 1

    h = chans[0].shape[0] - 2 * border
    w = chans[0].shape[1] - 2 * border

    def at(p, dy, dx):
        return p[border + dy : border + dy + h, border + dx : border + dx + w]

    inv_sigma_px = inv_sigma_tile[border : border + h, border : border + w]

    sm = np.float32(sigma_scale * 1.65)
    bsm = np.float32(sigma_scale * 1.65 * cfg.border_sad_mul)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) + y0 + border) % BLOCK_DIM
    xs = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + x0 + border) % BLOCK_DIM
    on_border = (ys == 0) | (ys == BLOCK_DIM - 1) | (xs == 0) | (xs == BLOCK_DIM - 1)
    sad_mul = jnp.where(on_border, bsm, sm)

    inv_sigma = inv_sigma_px * sad_mul
    weights = []
    for ny, nx in neighbors:
        sad = None
        for c, p in enumerate(chans):
            cs = np.float32(cfg.channel_scale[c])
            s = None
            for py, px in pattern:
                d = jnp.abs(at(p, py, px) - at(p, ny + py, nx + px))
                s = d if s is None else s + d
            term = s * cs
            sad = term if sad is None else sad + term
        weights.append(jnp.maximum(sad * inv_sigma + np.float32(1.0), 0.0))

    wsum = np.float32(1.0) + sum(weights)
    passthrough = inv_sigma_px < MIN_SIGMA
    out = []
    for p in chans:
        acc = at(p, 0, 0)
        for wgt, (ny, nx) in zip(weights, neighbors):
            acc = acc + wgt * at(p, ny, nx)
        out.append(jnp.where(passthrough, at(p, 0, 0), acc / wsum))
    return out, inv_sigma_tile[border:-border, border:-border]


class _Cfg:
    __slots__ = ("gab_weights", "epf_iters", "pass0_scale", "pass2_scale",
                 "border_sad_mul", "channel_scale")

    def __init__(self, gab_weights, epf_iters, pass0_scale, pass2_scale,
                 border_sad_mul, channel_scale):
        self.gab_weights = gab_weights
        self.epf_iters = epf_iters
        self.pass0_scale = pass0_scale
        self.pass2_scale = pass2_scale
        self.border_sad_mul = border_sad_mul
        self.channel_scale = channel_scale


@functools.lru_cache(maxsize=32)
def _build(key, h: int, w: int, band: int, interpret: bool):
    (gab_weights, epf_iters, p0, p2, bsm, cs) = key
    cfg = _Cfg(gab_weights, epf_iters, p0, p2, bsm, cs)
    # 2-D tiling: row bands x column tiles. Column tiles cap VMEM use on
    # wide images (EPF0's intermediates cost ~128 B/px of tile area);
    # CTILE output columns need CTILE + 2*HALO input, padded to a
    # lane-aligned CTILE + 128 scratch width.
    CTILE = 1024
    num_ctiles = -(-w // CTILE)
    hp = -(-h // band) * band + 2 * HALO  # padded height
    wp = num_ctiles * CTILE + 128  # padded width (128 >= 2*HALO, aligned)
    num_bands = -(-h // band)
    tile_h = band + 2 * HALO
    tile_w = CTILE + 128

    def kernel(planes_hbm, sigma_hbm, out_ref, pscr, sscr, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cp = pltpu.make_async_copy(
            planes_hbm.at[:, pl.ds(i * band, tile_h), pl.ds(j * CTILE, tile_w)],
            pscr,
            sems.at[0],
        )
        cs_dma = pltpu.make_async_copy(
            sigma_hbm.at[pl.ds(i * band, tile_h), pl.ds(j * CTILE, tile_w)],
            sscr,
            sems.at[1],
        )
        cp.start()
        cs_dma.start()
        cp.wait()
        cs_dma.wait()

        # tile origin in absolute image coords
        y0 = i * band - HALO
        x0 = j * CTILE - HALO
        chans = [pscr[c] for c in range(3)]
        sig = sscr[:, :]
        consumed = 0
        if gab_weights is not None:
            chans = [
                _gab_valid(c, w1, w2) for c, (w1, w2) in zip(chans, gab_weights)
            ]
            sig = sig[1:-1, 1:-1]
            consumed += 1
        steps = []
        if epf_iters >= 3:
            steps.append(0)
        if epf_iters >= 1:
            steps.append(1)
        if epf_iters >= 2:
            steps.append(2)
        for s in steps:
            chans, sig = _epf_valid(
                chans, sig, s, cfg, y0 + consumed, x0 + consumed
            )
            consumed += {0: 3, 1: 2, 2: 1}[s]
        # any unconsumed halo (e.g. epf_iters < 3) is trimmed here
        rem = HALO - consumed
        if rem > 0:
            chans = [c[rem:-rem, rem:-rem] for c in chans]
        # tile carries 128-8=120 extra right columns of halo slack; the
        # valid output block is the first CTILE columns
        out_ref[:, :, :] = jnp.stack(chans)[:, :, :CTILE]

    fn = pl.pallas_call(
        kernel,
        grid=(num_bands, num_ctiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (3, band, CTILE), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (3, num_bands * band, num_ctiles * CTILE), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(planes, inv_sigma):
        # mirror-pad the true halo, then edge-extend the alignment slack
        # (slack columns/rows only feed outputs past the crop)
        pad_b = hp - h - 2 * HALO
        pad_r = wp - w - 2 * HALO
        pp = jnp.pad(planes, ((0, 0), (HALO, HALO), (HALO, HALO)), mode="symmetric")
        sp = jnp.pad(inv_sigma, ((HALO, HALO), (HALO, HALO)), mode="symmetric")
        pp = jnp.pad(pp, ((0, 0), (0, pad_b), (0, pad_r)), mode="edge")
        sp = jnp.pad(sp, ((0, pad_b), (0, pad_r)), mode="edge")
        out = fn(pp, sp)
        return out[:, :h, :w]

    return run


def epf_gab_pallas(planes, inv_sigma, gab_weights, epf_iters, pass0_scale,
                   pass2_scale, border_sad_mul, channel_scale,
                   band: int = 64, interpret: bool = False):
    """Run gaborish + EPF on (3, H, W) planes with per-pixel 1/sigma.

    gab_weights: None or 3 (w1, w2) tuples. Returns (3, H, W) float32.
    """
    _, h, w = planes.shape
    key = (
        gab_weights,
        int(epf_iters),
        float(pass0_scale),
        float(pass2_scale),
        float(border_sad_mul),
        tuple(float(c) for c in channel_scale),
    )
    run = _build(key, h, w, band, interpret)
    return run(jnp.asarray(planes, jnp.float32), jnp.asarray(inv_sigma, jnp.float32))
