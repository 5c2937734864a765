"""Jitted device filter chain: gaborish + EPF0/1/2 as one fused XLA program.

The host oracle path (render/simple.py with xp=numpy) and this device path
share the exact same stage math (render/stages/core.py); this module only
closes the restoration-filter parameters over a jit-compiled function so
the whole filter bundle becomes a handful of fused HBM passes on TPU
(capability ref: jxl/src/render/stages/{gaborish,epf/*}.rs executed row-wise
by the low-memory pipeline; here the frame is one device program).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .stages import core as st


class _Rf:
    """Plain restoration-filter parameter holder for stage code."""

    __slots__ = (
        "epf_sharp_lut",
        "epf_channel_scale",
        "epf_pass0_sigma_scale",
        "epf_pass2_sigma_scale",
        "epf_border_sad_mul",
    )


def _rf_key(rf) -> tuple:
    return (
        tuple(rf.epf_channel_scale),
        float(rf.epf_pass0_sigma_scale),
        float(rf.epf_pass2_sigma_scale),
        float(rf.epf_border_sad_mul),
    )


def _use_pallas(h: int, w: int) -> bool:
    """The fused Pallas filter kernel runs on real TPU for frames large
    enough to band (small frames keep the plain-XLA path)."""
    import jax

    return jax.default_backend() == "tpu" and h >= 72 and w >= 136


def _apply_filter_chain(chans, inv_sigma_px, gab_weights, epf_iters, rf_obj):
    """Gaborish + EPF on 3 jnp planes: Pallas kernel on TPU, stage math
    otherwise. Both produce the same values (interior bit-identical)."""
    h, w = chans[0].shape
    if (gab_weights is not None or epf_iters > 0) and _use_pallas(h, w):
        from ..ops.pallas_epf import epf_gab_pallas

        out = epf_gab_pallas(
            jnp.stack(chans),
            inv_sigma_px,
            gab_weights,
            epf_iters,
            rf_obj.epf_pass0_sigma_scale,
            rf_obj.epf_pass2_sigma_scale,
            rf_obj.epf_border_sad_mul,
            tuple(rf_obj.epf_channel_scale),
        )
        return [out[0], out[1], out[2]]
    if gab_weights is not None:
        chans = [st.gaborish(jnp, c, w1, w2) for c, (w1, w2) in zip(chans, gab_weights)]
    if epf_iters >= 3:
        chans = st.epf_step_px(jnp, chans, inv_sigma_px, rf_obj, 0)
    if epf_iters >= 1:
        chans = st.epf_step_px(jnp, chans, inv_sigma_px, rf_obj, 1)
    if epf_iters >= 2:
        chans = st.epf_step_px(jnp, chans, inv_sigma_px, rf_obj, 2)
    return chans


@functools.lru_cache(maxsize=64)
def _filter_fn(gab_weights, epf_iters: int, rf_key: tuple, wire_f16: bool = False):
    """Build + jit the filter program for one static configuration.

    Signature of the returned fn: (planes (3,H,W), inv_sigma_px (H,W)) ->
    (3,H,W). With wire_f16 the in/out arrays are f16 on the wire while the
    filter math runs in f32 on device. Compiled once per (config, shape).
    """
    rf = _Rf()
    rf.epf_channel_scale = list(rf_key[0])
    rf.epf_pass0_sigma_scale = rf_key[1]
    rf.epf_pass2_sigma_scale = rf_key[2]
    rf.epf_border_sad_mul = rf_key[3]
    rf.epf_sharp_lut = None  # sigma already expanded to per-pixel

    def fn(planes, sigma_blk):
        if wire_f16:
            planes = planes.astype(jnp.float32)
            sigma_blk = sigma_blk.astype(jnp.float32)
        ph, pw = planes.shape[1], planes.shape[2]
        inv_sigma_px = st._expand_sigma(jnp, sigma_blk, ph, pw, (0, 0))
        chans = [planes[0], planes[1], planes[2]]
        chans = _apply_filter_chain(chans, inv_sigma_px, gab_weights, epf_iters, rf)
        out = jnp.stack(chans)
        return out.astype(jnp.float16) if wire_f16 else out

    return jax.jit(fn)


def _sigma_px(rf, sigma_block, constant_sigma, h, w):
    if rf.epf_iters > 0:
        if sigma_block is not None:
            return np.asarray(
                st._expand_sigma(np, sigma_block, h, w, (0, 0)), dtype=np.float32
            )
        return np.full((h, w), np.float32(constant_sigma))
    return np.zeros((h, w), dtype=np.float32)


def _gab_key(rf):
    if not rf.gab:
        return None
    return (
        (float(rf.gab_x_weight1), float(rf.gab_x_weight2)),
        (float(rf.gab_y_weight1), float(rf.gab_y_weight2)),
        (float(rf.gab_b_weight1), float(rf.gab_b_weight2)),
    )


# fused filters + color-transform programs, keyed by static config
_FUSED_CACHE: dict = {}


def run_filters_and_color(
    frame, planes3, sigma_block, constant_sigma, out_hw, out_format: str = "f32"
):
    """Filters + crop + color transform (+ output pixel-format conversion) as
    ONE device program: a single upload and a single download per frame (the
    halo-free whole-image analog of the reference pipeline's stage list,
    frame/render.rs:506-885). With out_format u8/u16/f16 the download shrinks
    4x/2x/2x (the ConvertF32To* save stages, convert.rs:549-)."""
    import jax

    header = frame.header
    meta = frame.file_header.image_metadata
    rf = header.restoration_filter
    h, w = planes3[0].shape
    oh, ow = out_hw

    ce = meta.color_encoding
    t = ce.tf
    tf_key = ("gamma", float(t.gamma_value())) if t.have_gamma else (t.transfer_function,)
    opsin = frame.file_header.transform_data.opsin_inverse_matrix
    # the jitted program closes over the full output color transform, so the
    # cache key must capture everything output_color_info derives from
    color_key = (
        bool(ce.want_icc),
        int(ce.color_space),
        int(ce.white_point),
        int(ce.primaries),
        tuple(p.as_f32() for p in ce.custom_primaries),
        ce.white.as_f32(),
    )
    key = (
        _gab_key(rf),
        int(rf.epf_iters),
        _rf_key(rf),
        bool(meta.xyb_encoded),
        bool(header.do_ycbcr),
        tf_key,
        color_key,
        float(meta.tone_mapping.intensity_target),
        tuple(opsin.inverse_matrix),
        tuple(opsin.opsin_biases),
        out_format,
    )
    fn = _FUSED_CACHE.get(key)
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

        def program(planes, sigma_blk):
            from . import simple as render_simple

            # per-pixel sigma is expanded from the 8x-smaller block map on
            # device (the host->device wire carries 64x fewer bytes)
            ph, pw = planes.shape[1], planes.shape[2]
            inv_sigma_px = st._expand_sigma(jnp, sigma_blk, ph, pw, (0, 0))
            chans = [planes[0], planes[1], planes[2]]
            chans = _apply_filter_chain(chans, inv_sigma_px, gab_weights, epf_iters, rf_obj)
            chans = render_simple.color_transform(frame, chans, xp=jnp)
            if out_format != "f32":
                chans = [
                    st.convert_output(jnp, c, out_format, channel=i)
                    for i, c in enumerate(chans)
                ]
            return jnp.stack(chans)

        fn = jax.jit(program)
        _FUSED_CACHE[key] = fn

    if rf.epf_iters > 0 and sigma_block is not None:
        sigma_blk = np.asarray(sigma_block, dtype=np.float32)
    else:
        sigma_blk = np.full(
            (-(-h // 8), -(-w // 8)),
            np.float32(constant_sigma if rf.epf_iters > 0 else 0.0),
        )
    # bucket shapes to multiples of 128 so animations with varying frame
    # sizes reuse one compiled program (remote compiles cost tens of
    # seconds): mirror-pad the filter halo, edge-pad the slack, crop after
    hp = -(-h // 128) * 128
    wp = -(-w // 128) * 128
    # the mirror halo below must cover the full 7-pixel filter support; if
    # the bucket leaves < 8 pixels of slack, bump it one bucket up so the
    # edge behavior matches the oracle's mirror-at-image-edge
    if 0 < hp - h < 8:
        hp += 128
    if 0 < wp - w < 8:
        wp += 128
    on_device = isinstance(planes3[0], jax.Array)
    xp = jnp if on_device else np
    stacked = xp.stack(planes3)
    if hp != h or wp != w:
        mh = min(8, hp - h, h - 1)
        mw = min(8, wp - w, w - 1)
        stacked = xp.pad(stacked, ((0, 0), (0, mh), (0, mw)), mode="symmetric")
        stacked = xp.pad(
            stacked, ((0, 0), (0, hp - h - mh), (0, wp - w - mw)), mode="edge"
        )
    # pad the block sigma to the padded pixel bucket; values in the pad
    # region never influence kept pixels (EPF weights use the center
    # pixel's sigma only), so edge-extend is sufficient
    bh_p, bw_p = hp // 8, wp // 8
    if sigma_blk.shape != (bh_p, bw_p):
        sigma_blk = np.pad(
            sigma_blk[:bh_p, :bw_p],
            (
                (0, bh_p - min(sigma_blk.shape[0], bh_p)),
                (0, bw_p - min(sigma_blk.shape[1], bw_p)),
            ),
            mode="edge",
        )
    out = fn(jnp.asarray(stacked), jnp.asarray(sigma_blk))
    out = np.array(jax.device_get(out))  # writable copy
    return [out[0, :oh, :ow], out[1, :oh, :ow], out[2, :oh, :ow]]


def run_filters(planes3, rf, sigma_block, constant_sigma, encoding_vardct: bool):
    """Apply gaborish + EPF to the 3 color planes on device.

    planes3: list of 3 (H, W) float32 numpy arrays. Returns 3 numpy arrays.
    For lossy (VarDCT) frames the host<->device wire format is f16: the
    tunnel transfer halves and the ~1e-3 relative rounding is far inside
    the lossy PSNR gates (compute stays f32 on device).
    """
    h, w = planes3[0].shape
    gab_weights = _gab_key(rf)
    epf_iters = int(rf.epf_iters)
    if gab_weights is None and epf_iters == 0:
        return planes3

    if epf_iters > 0 and sigma_block is not None:
        sigma_blk = np.asarray(sigma_block, dtype=np.float32)[
            : -(-h // 8), : -(-w // 8)
        ]
    else:
        sigma_blk = np.full(
            (-(-h // 8), -(-w // 8)),
            np.float32(constant_sigma if epf_iters > 0 else 0.0),
        )
    on_device = isinstance(planes3[0], jax.Array)
    wire_f16 = (
        not on_device and encoding_vardct and h * w >= 1 << 21
    )  # >=2 MP host planes: transfer-bound
    fn = _filter_fn(gab_weights, epf_iters, _rf_key(rf), wire_f16)
    stacked = jnp.stack(planes3) if on_device else np.stack(planes3)
    if wire_f16:
        stacked = stacked.astype(np.float16)
        sigma_blk = sigma_blk.astype(np.float16)
    out = fn(jnp.asarray(stacked), jnp.asarray(sigma_blk))
    out = np.array(jax.device_get(out), dtype=np.float32)  # writable copy
    return [out[0], out[1], out[2]]
