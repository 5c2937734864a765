"""Transfer functions: sRGB, BT.709, PQ, HLG, gamma (precise variants).

Capability reference: jxl/src/color/tf.rs. The reference also carries
fast rational-polynomial approximations for speed; the device pipeline
uses these precise forms (XLA fuses them into the surrounding stage).

Every function takes an ``xp`` array module (numpy or jax.numpy) so the
identical math runs on the host oracle and inside jitted device programs.
"""

from __future__ import annotations

import numpy as np


def linear_to_srgb(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a <= 0.0031308,
        a * np.float32(12.92),
        np.float32(1.055) * xp.power(a, np.float32(1.0 / 2.4)) - np.float32(0.055),
    )
    return xp.copysign(out, v).astype(np.float32)


def srgb_to_linear(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a <= 0.04045,
        a / np.float32(12.92),
        xp.power((a + np.float32(0.055)) / np.float32(1.055), np.float32(2.4)),
    )
    return xp.copysign(out, v).astype(np.float32)


def linear_to_bt709(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a < 0.018053968510807,
        a * np.float32(4.5),
        np.float32(1.09929682680944) * xp.power(a, np.float32(0.45))
        - np.float32(0.09929682680944),
    )
    return xp.copysign(out, v).astype(np.float32)


def bt709_to_linear(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a < 0.018053968510807 * 4.5,
        a / np.float32(4.5),
        xp.power(
            (a + np.float32(0.09929682680944)) / np.float32(1.09929682680944),
            np.float32(1.0 / 0.45),
        ),
    )
    return xp.copysign(out, v).astype(np.float32)


def linear_to_gamma(v, g: float, xp=np):
    a = xp.abs(v)
    return xp.copysign(xp.power(a, np.float32(g)), v).astype(np.float32)


# -- PQ (SMPTE ST 2084) ---------------------------------------------------

_PQ_M1 = 2610.0 / 16384
_PQ_M2 = (2523.0 / 4096) * 128
_PQ_C1 = 3424.0 / 4096
_PQ_C2 = (2413.0 / 4096) * 32
_PQ_C3 = (2392.0 / 4096) * 32


def linear_to_pq(v, intensity_target: float, xp=np):
    # 1.0 == intensity_target nits; PQ encodes absolute 10000-nit range.
    # numpy path computes in f64 (matches the reference's precise variant);
    # the device path uses f32 (PSNR-gated).
    dt = np.float64 if xp is np else np.float32
    a = xp.abs(v).astype(dt) * dt(intensity_target / 10000.0)
    ym = xp.power(a, dt(_PQ_M1))
    out = xp.power((dt(_PQ_C1) + dt(_PQ_C2) * ym) / (1.0 + dt(_PQ_C3) * ym), dt(_PQ_M2))
    return xp.copysign(out, v).astype(np.float32)


def pq_to_linear(v, intensity_target: float, xp=np):
    dt = np.float64 if xp is np else np.float32
    a = xp.abs(v).astype(dt)
    vp = xp.power(a, dt(1.0 / _PQ_M2))
    num = xp.maximum(vp - dt(_PQ_C1), 0.0)
    out = xp.power(num / (dt(_PQ_C2) - dt(_PQ_C3) * vp), dt(1.0 / _PQ_M1))
    return xp.copysign(out * dt(10000.0 / intensity_target), v).astype(np.float32)


# -- HLG (ARIB STD-B67) ------------------------------------------------------

_HLG_A = 0.17883277
_HLG_B = 1.0 - 4.0 * _HLG_A
_HLG_C = 0.5 - _HLG_A * np.log(4.0 * _HLG_A)


def scene_to_hlg(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a <= 1.0 / 12.0,
        xp.sqrt(np.float32(3.0) * a),
        np.float32(_HLG_A) * xp.log(xp.maximum(np.float32(12.0) * a - np.float32(_HLG_B), 1e-30))
        + np.float32(_HLG_C),
    )
    return xp.copysign(out, v).astype(np.float32)


def hlg_to_scene(v, xp=np):
    a = xp.abs(v)
    out = xp.where(
        a <= 0.5,
        a * a / np.float32(3.0),
        (xp.exp((a - np.float32(_HLG_C)) / np.float32(_HLG_A)) + np.float32(_HLG_B))
        / np.float32(12.0),
    )
    return xp.copysign(out, v).astype(np.float32)


def hlg_display_to_scene(intensity_target: float, luminances, rows, xp=np):
    """Inverse HLG OOTF: display-light -> scene-light (ref tf.rs)."""
    gamma = 1.2 * 1.111 ** np.log2(intensity_target / 1000.0)
    exp = np.float32((1.0 - gamma) / gamma)
    r, g, b = rows
    lum = (
        np.float32(luminances[0]) * r
        + np.float32(luminances[1]) * g
        + np.float32(luminances[2]) * b
    )
    mul = xp.where(lum > 1e-10, xp.power(xp.abs(lum), exp), np.float32(0.0))
    return (r * mul, g * mul, b * mul)
