"""Transfer functions: sRGB, BT.709, PQ, HLG, gamma (precise variants).

Capability reference: jxl/src/color/tf.rs. The reference also carries
fast rational-polynomial approximations for speed; the device pipeline
uses these precise forms (XLA fuses them into the surrounding stage).
"""

from __future__ import annotations

import numpy as np


def linear_to_srgb(v: np.ndarray) -> np.ndarray:
    a = np.abs(v)
    out = np.where(
        a <= 0.0031308,
        a * 12.92,
        1.055 * np.power(a, 1.0 / 2.4, dtype=np.float32) - 0.055,
    )
    return np.copysign(out, v).astype(np.float32)


def srgb_to_linear(v: np.ndarray) -> np.ndarray:
    a = np.abs(v)
    out = np.where(a <= 0.04045, a / 12.92, np.power((a + 0.055) / 1.055, 2.4, dtype=np.float32))
    return np.copysign(out, v).astype(np.float32)


def linear_to_bt709(v: np.ndarray) -> np.ndarray:
    a = np.abs(v)
    out = np.where(a < 0.018053968510807, a * 4.5, 1.09929682680944 * np.power(a, 0.45, dtype=np.float32) - 0.09929682680944)
    return np.copysign(out, v).astype(np.float32)


def linear_to_gamma(v: np.ndarray, g: float) -> np.ndarray:
    a = np.abs(v)
    return np.copysign(np.power(a, g, dtype=np.float32), v).astype(np.float32)


# -- PQ (SMPTE ST 2084) ---------------------------------------------------

_PQ_M1 = 2610.0 / 16384
_PQ_M2 = (2523.0 / 4096) * 128
_PQ_C1 = 3424.0 / 4096
_PQ_C2 = (2413.0 / 4096) * 32
_PQ_C3 = (2392.0 / 4096) * 32


def linear_to_pq(v: np.ndarray, intensity_target: float) -> np.ndarray:
    # 1.0 == intensity_target nits; PQ encodes absolute 10000-nit range
    a = np.abs(v) * (intensity_target / 10000.0)
    ym = np.power(a, _PQ_M1, dtype=np.float64)
    out = np.power((_PQ_C1 + _PQ_C2 * ym) / (1.0 + _PQ_C3 * ym), _PQ_M2, dtype=np.float64)
    return np.copysign(out, v).astype(np.float32)


def pq_to_linear(v: np.ndarray, intensity_target: float) -> np.ndarray:
    a = np.abs(v).astype(np.float64)
    vp = np.power(a, 1.0 / _PQ_M2)
    num = np.maximum(vp - _PQ_C1, 0.0)
    out = np.power(num / (_PQ_C2 - _PQ_C3 * vp), 1.0 / _PQ_M1)
    return np.copysign(out * (10000.0 / intensity_target), v).astype(np.float32)


# -- HLG (ARIB STD-B67) ------------------------------------------------------

_HLG_A = 0.17883277
_HLG_B = 1.0 - 4.0 * _HLG_A
_HLG_C = 0.5 - _HLG_A * np.log(4.0 * _HLG_A)


def scene_to_hlg(v: np.ndarray) -> np.ndarray:
    a = np.abs(v)
    out = np.where(
        a <= 1.0 / 12.0,
        np.sqrt(3.0 * a),
        _HLG_A * np.log(np.maximum(12.0 * a - _HLG_B, 1e-30)) + _HLG_C,
    )
    return np.copysign(out, v).astype(np.float32)


def hlg_to_scene(v: np.ndarray) -> np.ndarray:
    a = np.abs(v)
    out = np.where(
        a <= 0.5,
        a * a / 3.0,
        (np.exp((a - _HLG_C) / _HLG_A) + _HLG_B) / 12.0,
    )
    return np.copysign(out, v).astype(np.float32)


def hlg_display_to_scene(intensity_target: float, luminances, rows):
    """Inverse HLG OOTF: display-light -> scene-light (ref tf.rs)."""
    gamma = 1.2 * 1.111 ** np.log2(intensity_target / 1000.0)
    exp = (1.0 - gamma) / gamma
    r, g, b = rows
    lum = luminances[0] * r + luminances[1] * g + luminances[2] * b
    mul = np.where(lum > 1e-10, np.power(np.abs(lum), exp, dtype=np.float32), 0.0)
    return (r * mul, g * mul, b * mul)
