"""Blending primitives shared by patches and frame-onto-canvas compositing.

Capability reference: jxl/src/features/blending.rs (perform_blending).
Vectorized whole-rect numpy; identical math runs under jnp in the device
pipeline.
"""

from __future__ import annotations

import numpy as np

from ..io.headers import ExtraChannel
from .patches import BlendMode, PatchBlending


def _clamp01(v, clamp, xp=np):
    return xp.clip(v, 0.0, 1.0) if clamp else v


def _muladd_weight(v, xp=np):
    """AlphaWeightedAdd weights are clamped to [0,1] regardless of the
    bitstream clamp flag (verified bit-exact vs libjxl on blendmodes.jxl,
    whose MulAdd layer carries alpha in [-0.98, 1.98]; kBlend weights by
    contrast stay unclamped when the flag is unset —
    multiple_layers_noise_spline composes bit-exact only with raw kBlend
    alphas). The reference's blending.rs clamps neither, diverging on
    out-of-range alpha."""
    return xp.clip(v, 0.0, 1.0)


def perform_blending(bg, fg, color_blending: PatchBlending, ec_blending, extra_channel_info, xp=np):
    """Blend fg onto bg (lists of (h, w) planes: 3 color + num_ec extras).

    Returns new planes (list). ref blending.rs:200-459. xp-generic:
    numpy host oracle / jnp in the device patches stage.
    """
    num_ec = len(extra_channel_info)
    # asarray, not copy: no code path mutates these in place (out entries
    # are only ever REPLACED), and whole-canvas copies dominated large-
    # image patch blending
    out = [xp.asarray(p, dtype=xp.float32) for p in bg]

    if color_blending.mode == BlendMode.NONE and all(
        b.mode == BlendMode.NONE for b in ec_blending
    ):
        return out

    if color_blending.mode == BlendMode.REPLACE and all(
        b.mode in (BlendMode.REPLACE, BlendMode.NONE) for b in ec_blending
    ):
        for c in range(3):
            out[c] = xp.asarray(fg[c], dtype=xp.float32)
        for i, b in enumerate(ec_blending):
            if b.mode == BlendMode.REPLACE:
                out[3 + i] = xp.asarray(fg[3 + i], dtype=xp.float32)
        return out

    has_alpha = any(info.ec_type == ExtraChannel.ALPHA for info in extra_channel_info)
    old_ec = [xp.asarray(bg[3 + i], dtype=xp.float32) for i in range(num_ec)]

    # extra channels first (ref order)
    for i, b in enumerate(ec_blending):
        alpha = b.alpha_channel
        clamp = b.clamp
        assoc = extra_channel_info[alpha].alpha_associated if num_ec else False
        eo = out[3 + i]
        fgi = xp.asarray(fg[3 + i], dtype=xp.float32)
        if b.mode == BlendMode.ADD:
            out[3 + i] = eo + fgi
        elif b.mode == BlendMode.BLEND_ABOVE:
            if i == alpha:
                ta = _clamp01(fgi, clamp, xp)
                out[3 + i] = 1.0 - (1.0 - ta) * (1.0 - eo)
            elif assoc:
                fa = _clamp01(xp.asarray(fg[3 + alpha], dtype=xp.float32), clamp, xp)
                out[3 + i] = fgi + eo * (1.0 - fa)
            else:
                fa = _clamp01(xp.asarray(fg[3 + alpha], dtype=xp.float32), clamp, xp)
                oa = old_ec[alpha]
                new_a = 1.0 - (1.0 - fa) * (1.0 - oa)
                r = xp.where(new_a > 0.0, 1.0 / xp.where(new_a == 0, 1, new_a), 0.0)
                out[3 + i] = (fgi * fa + eo * oa * (1.0 - fa)) * r
        elif b.mode == BlendMode.BLEND_BELOW:
            if i == alpha:
                ta = _clamp01(eo, clamp, xp)
                out[3 + i] = 1.0 - (1.0 - ta) * (1.0 - fgi)
            elif assoc:
                ba = _clamp01(old_ec[alpha], clamp, xp)
                out[3 + i] = eo + fgi * (1.0 - ba)
            else:
                ba = _clamp01(old_ec[alpha], clamp, xp)
                fa = xp.asarray(fg[3 + alpha], dtype=xp.float32)
                new_a = 1.0 - (1.0 - ba) * (1.0 - fa)
                r = xp.where(new_a > 0.0, 1.0 / xp.where(new_a == 0, 1, new_a), 0.0)
                out[3 + i] = (eo * ba + fgi * fa * (1.0 - ba)) * r
        elif b.mode == BlendMode.ALPHA_WEIGHTED_ADD_ABOVE:
            if i != alpha:
                w = _muladd_weight(xp.asarray(fg[3 + alpha], dtype=xp.float32), xp)
                out[3 + i] = eo + fgi * w
        elif b.mode == BlendMode.ALPHA_WEIGHTED_ADD_BELOW:
            if i == alpha:
                out[3 + i] = fgi
            else:
                w = _muladd_weight(old_ec[alpha], xp)
                out[3 + i] = fgi + eo * w
        elif b.mode == BlendMode.MUL:
            out[3 + i] = eo * _clamp01(fgi, clamp, xp)
        elif b.mode == BlendMode.REPLACE:
            out[3 + i] = fgi

    alpha = color_blending.alpha_channel
    clamp = color_blending.clamp
    mode = color_blending.mode
    if mode == BlendMode.ADD:
        for c in range(3):
            out[c] = out[c] + fg[c]
    elif mode == BlendMode.ALPHA_WEIGHTED_ADD_ABOVE:
        for c in range(3):
            if not has_alpha:
                out[c] = out[c] + fg[c]
            else:
                w = _muladd_weight(xp.asarray(fg[3 + alpha], dtype=xp.float32), xp)
                out[c] = out[c] + fg[c] * w
    elif mode == BlendMode.ALPHA_WEIGHTED_ADD_BELOW:
        for c in range(3):
            if not has_alpha:
                out[c] = out[c] + fg[c]
            else:
                w = _muladd_weight(old_ec[alpha], xp)
                out[c] = fg[c] + out[c] * w
    elif mode == BlendMode.BLEND_ABOVE:
        if not has_alpha:
            for c in range(3):
                out[c] = xp.asarray(fg[c], dtype=xp.float32)
        else:
            _blend_color(out, fg, old_ec[alpha], clamp,
                         extra_channel_info[alpha].alpha_associated, True, alpha, xp)
    elif mode == BlendMode.BLEND_BELOW:
        if has_alpha:
            _blend_color(out, fg, old_ec[alpha], clamp,
                         extra_channel_info[alpha].alpha_associated, False, alpha, xp)
    elif mode == BlendMode.MUL:
        for c in range(3):
            out[c] = out[c] * _clamp01(xp.asarray(fg[c], dtype=xp.float32), clamp, xp)
    elif mode == BlendMode.REPLACE:
        for c in range(3):
            out[c] = xp.asarray(fg[c], dtype=xp.float32)
    return out


def _blend_color(out, fg, bg_alpha_old, clamp, assoc, fg_on_top, alpha, xp=np):
    """ref blending.rs blend_impl: the top layer's alpha drives the blend;
    also updates the alpha channel itself (out[3+alpha])."""
    fga = xp.asarray(fg[3 + alpha], dtype=xp.float32)
    if fg_on_top:
        top_a = _clamp01(fga, clamp, xp)
        bottom_a = bg_alpha_old
    else:
        top_a = _clamp01(bg_alpha_old, clamp, xp)
        bottom_a = fga
    one_minus = 1.0 - top_a
    new_a = 1.0 - one_minus * (1.0 - bottom_a)
    r = xp.where(new_a > 0.0, 1.0 / xp.where(new_a == 0, 1, new_a), 0.0)
    for c in range(3):
        bgv = out[c]
        fgv = xp.asarray(fg[c], dtype=xp.float32)
        top_c, bottom_c = (fgv, bgv) if fg_on_top else (bgv, fgv)
        if assoc:
            out[c] = top_c + bottom_c * one_minus
        else:
            out[c] = (top_c * top_a + bottom_c * bottom_a * one_minus) * r
    out[3 + alpha] = new_a
