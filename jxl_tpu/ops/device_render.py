"""Device (JAX) render programs: the per-frame pixel pipeline as a single
jittable function, built from the same stage math as the host oracle
(render/stages/core.py with xp=jax.numpy).

The whole post-coefficient pipeline — gaborish, EPF, upsampling, XYB->RGB,
transfer function — is one fused XLA program per frame shape: elementwise
chains fuse into a handful of HBM passes, and the upsampling einsum maps
onto the MXU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from ..render.stages import core as st


@dataclass(frozen=True)
class RenderParams:
    """Static (compile-time) per-frame render configuration."""

    gab: bool = True
    gab_weights: tuple = ((0.115169525, 0.061248592),) * 3
    epf_iters: int = 2
    epf_sharp_lut: tuple = (0.0, 1 / 7, 2 / 7, 3 / 7, 4 / 7, 5 / 7, 6 / 7, 1.0)
    epf_channel_scale: tuple = (40.0, 5.0, 3.5)
    epf_pass0_sigma_scale: float = 0.9
    epf_pass2_sigma_scale: float = 6.5
    epf_border_sad_mul: float = 2.0 / 3.0
    intensity_target: float = 255.0
    opsin_inverse_matrix: tuple = (
        11.031566901960783, -9.866943921568629, -0.16462299647058826,
        -3.254147380392157, 4.418770392156863, -0.16462299647058826,
        -3.6588512862745097, 2.7129230470588235, 1.9459282392156863,
    )
    opsin_biases: tuple = (-0.0037930732552754493,) * 3

    # Adapter properties so stage code can treat this like the header struct
    @property
    def inverse_matrix(self):
        return self.opsin_inverse_matrix


class _RfAdapter:
    """Adapts RenderParams to the restoration_filter interface of stages."""

    def __init__(self, p: RenderParams):
        self.epf_sharp_lut = list(p.epf_sharp_lut)
        self.epf_channel_scale = list(p.epf_channel_scale)
        self.epf_pass0_sigma_scale = p.epf_pass0_sigma_scale
        self.epf_pass2_sigma_scale = p.epf_pass2_sigma_scale
        self.epf_border_sad_mul = p.epf_border_sad_mul


def _linear_to_srgb(v):
    a = jnp.abs(v)
    out = jnp.where(a <= 0.0031308, a * 12.92, 1.055 * jnp.power(a, 1.0 / 2.4) - 0.055)
    return jnp.copysign(out, v)


def _xyb_to_linear(x, y, b, params: RenderParams):
    mat = jnp.asarray(params.opsin_inverse_matrix, dtype=jnp.float32)
    biases = np.asarray(params.opsin_biases, dtype=np.float32)
    bias_cbrt = np.cbrt(biases)
    scale = np.float32(255.0 / params.intensity_target)
    l = y + x - bias_cbrt[0]
    m = y - x - bias_cbrt[1]
    s = b - bias_cbrt[2]
    l = l * l * (l * scale) + biases[0] * scale
    m = m * m * (m * scale) + biases[1] * scale
    s = s * s * (s * scale) + biases[2] * scale
    r = mat[0] * l + mat[1] * m + mat[2] * s
    g = mat[3] * l + mat[4] * m + mat[5] * s
    bl = mat[6] * l + mat[7] * m + mat[8] * s
    return r, g, bl


def render_block(planes, inv_sigma_block, params: RenderParams, pos=(0, 0)):
    """The fused per-frame pixel program: planes (3, H, W) XYB -> (3, H, W)
    sRGB. `inv_sigma_block` is the per-8x8-block 1/sigma map (H/8, W/8)."""
    rf = _RfAdapter(params)
    x, y, b = planes[0], planes[1], planes[2]
    chans = [x, y, b]
    if params.gab:
        chans = [
            st.gaborish(jnp, c, w1, w2) for c, (w1, w2) in zip(chans, params.gab_weights)
        ]
    if params.epf_iters >= 3:
        chans = st.epf_step(jnp, chans, inv_sigma_block, rf, 0, pos=pos)
    if params.epf_iters >= 1:
        chans = st.epf_step(jnp, chans, inv_sigma_block, rf, 1, pos=pos)
    if params.epf_iters >= 2:
        chans = st.epf_step(jnp, chans, inv_sigma_block, rf, 2, pos=pos)
    r, g, bl = _xyb_to_linear(chans[0], chans[1], chans[2], params)
    out = jnp.stack([_linear_to_srgb(r), _linear_to_srgb(g), _linear_to_srgb(bl)])
    return out


@functools.lru_cache(maxsize=8)
def jit_render(params: RenderParams):
    return jax.jit(lambda planes, sigma: render_block(planes, sigma, params))


# -- batched IDCT (MXU) ----------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _idct_mats(n: int):
    from ..vardct.transforms import idct_matrix

    return jnp.asarray(idct_matrix(n))


def idct8_batch(coeffs):
    """Batched 8x8 IDCT: (N, 8, 8) coefficient blocks -> (N, 8, 8) pixels.

    pixels = A @ (A @ C).T per block — two batched matmuls on the MXU.
    """
    a = _idct_mats(8)
    t1 = jnp.einsum("yu,nux->nyx", a, coeffs)
    return jnp.einsum("yu,nxu->nyx", a, t1)


def dequant_cfl_idct8(qblocks, dq_mats, scale_y, x_mul, b_mul, x_cc, b_cc, biases, lf):
    """Fused dequant + CfL + batched IDCT for DCT8 blocks.

    qblocks: (N, 3, 64) int32; dq_mats: (3, 64); x_cc/b_cc: (N,) per-block
    CfL multipliers; lf: (N, 3) LF values; returns (N, 3, 8, 8) pixels.
    """
    q = qblocks.astype(jnp.float32)
    b = jnp.asarray(biases, dtype=jnp.float32)
    small = jnp.abs(qblocks) < 2
    adj = jnp.where(small, q * b[None, :3, None], q - b[3] / jnp.where(q == 0, 1.0, q))
    adj = jnp.where(qblocks == 0, 0.0, adj)
    scales = jnp.stack([scale_y * x_mul, scale_y, scale_y * b_mul])
    dq = adj * dq_mats[None] * scales[None, :, None]
    dq = dq.at[:, 0].add(x_cc[:, None] * dq[:, 1])
    dq = dq.at[:, 2].add(b_cc[:, None] * dq[:, 1])
    dq = dq.reshape(-1, 3, 8, 8).at[:, :, 0, 0].set(lf)
    return jax.vmap(idct8_batch, in_axes=1, out_axes=1)(dq)
