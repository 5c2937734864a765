"""Per-band filters + color transform + output conversion device programs.

The band analog of run_filters_and_color (device_filters.py): each band's
gaborish/EPF runs over [8-row tail of the previous band | band | up-to-8-row
head of the next band], mirroring at the visible frame edge exactly like
the whole-image program (ref render/low_memory_pipeline border handling,
low_memory_pipeline/mod.rs:184-289 — here the halo rows are real device
rows so band output is bit-identical to the whole-image pipeline; the
FILTER_HALO=8 >= the 7-pixel gaborish+EPF support).

Dither alignment: bands start at multiples of GROUP_DIM (256) which is a
multiple of the 32x32 blue-noise tile, so per-band pos=(0,0) conversion
matches the whole-image conversion bit-for-bit (stages/convert.rs:549-).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .device_filters import _Rf, _apply_filter_chain, _gab_key, _rf_key
from .stages import core as st

HALO = 8  # rows of real neighbor data each side (gaborish 1 + EPF 3+2+1)

_CACHE: dict = {}


def _color_key(frame):
    meta = frame.file_header.image_metadata
    ce = meta.color_encoding
    t = ce.tf
    tf_key = (
        ("gamma", float(t.gamma_value())) if t.have_gamma else (t.transfer_function,)
    )
    opsin = frame.file_header.transform_data.opsin_inverse_matrix
    return (
        bool(meta.xyb_encoded),
        bool(frame.header.do_ycbcr),
        bool(ce.want_icc),
        int(ce.color_space),
        int(ce.white_point),
        int(ce.primaries),
        tuple(p.as_f32() for p in ce.custom_primaries),
        ce.white.as_f32(),
        tf_key,
        float(meta.tone_mapping.intensity_target),
        tuple(opsin.inverse_matrix),
        tuple(opsin.opsin_biases),
    )


def dispatch_band_filters(
    frame,
    prev,
    cur,
    nxt,
    sigma_band: np.ndarray,
    *,
    rows: int,
    bot_rows: int,
    wv: int,
    out_format: str,
):
    """Async-dispatch filters+color+convert for one band.

    prev/cur/nxt: (3, GROUP_DIM, W) device arrays from the band IDCT
    program (prev is None for the first band, nxt None for the last).
    sigma_band: host block-resolution 1/sigma rows covering
    [band_top - top_halo, band_top + rows + bot_rows) (top_halo = HALO
    when prev is not None else 0), width >= ceil(wv/8).
    rows: visible rows in this band; bot_rows: halo rows taken from nxt
    (min(HALO, next band's visible rows)). Returns the (3, rows, wv)
    device array in the output dtype — not synchronized.
    """
    header = frame.header
    rf = header.restoration_filter
    has_top = prev is not None
    has_bot = nxt is not None and bot_rows > 0
    key = (
        _gab_key(rf),
        int(rf.epf_iters),
        _rf_key(rf),
        _color_key(frame),
        has_top,
        has_bot,
        int(rows),
        int(bot_rows),
        int(wv),
        cur.shape[2],
        out_format,
    )
    fn = _CACHE.get(key)
    if fn is None:
        gab_weights = _gab_key(rf)
        epf_iters = int(rf.epf_iters)
        rfk = _rf_key(rf)
        rf_obj = _Rf()
        rf_obj.epf_channel_scale = list(rfk[0])
        rf_obj.epf_pass0_sigma_scale = rfk[1]
        rf_obj.epf_pass2_sigma_scale = rfk[2]
        rf_obj.epf_border_sad_mul = rfk[3]
        rf_obj.epf_sharp_lut = None
        pad_top = HALO if has_top else 0
        pad_bot = bot_rows if has_bot else 0
        GD = cur.shape[1]

        def program(prev_a, cur_a, nxt_a, sigma_blk):
            from . import simple as render_simple

            parts = []
            if has_top:
                parts.append(prev_a[:, GD - HALO :, :wv])
            parts.append(cur_a[:, :rows, :wv])
            if has_bot:
                parts.append(nxt_a[:, :pad_bot, :wv])
            slab = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            sh = pad_top + rows + pad_bot
            if gab_weights is not None or epf_iters > 0:
                inv_sigma_px = st._expand_sigma(jnp, sigma_blk, sh, wv, (0, 0))
                chans = [slab[0], slab[1], slab[2]]
                chans = _apply_filter_chain(
                    chans, inv_sigma_px, gab_weights, epf_iters, rf_obj
                )
            else:
                chans = [slab[0], slab[1], slab[2]]
            chans = [c[pad_top : pad_top + rows] for c in chans]
            chans = render_simple.color_transform(frame, chans, xp=jnp)
            if out_format != "f32":
                chans = [
                    st.convert_output(jnp, c, out_format, channel=i)
                    for i, c in enumerate(chans)
                ]
            return jnp.stack(chans)

        fn = jax.jit(program)
        _CACHE[key] = fn

    dummy = cur  # unused input for missing neighbors keeps one arity
    sig = jax.device_put(np.ascontiguousarray(sigma_band, dtype=np.float32))
    return fn(prev if has_top else dummy, cur, nxt if has_bot else dummy, sig)
