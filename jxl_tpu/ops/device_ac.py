"""On-device VarDCT AC coefficient decode: rANS + HybridUint + context
modeling for all HF sections of a frame, lanes = (group, pass) sections.

SURVEY §7 entropy plan: rANS state is a serial chain per section, so device
parallelism is across sections — each lane carries one section's decoder
state (ANS state, bit cursor, block-walk position, nonzeros map) and a
`lax.while_loop` decodes one token per lane per iteration until every lane
finishes. Coefficients scatter-add directly into the frame's device
coefficient buffer, so they never cross the host wire.

Semantics mirror the native C++ decoder (native/modular_decode.cc
jxl_decode_vardct_ac) exactly; that path is the bit-exactness reference
(itself verified against the Python oracle and the reference
jxl/src/frame/group.rs:384-618).

Eligibility (checked by the caller): ANS (not prefix) histograms, no LZ77,
and no modular-HF channels in the sections (so the post-AC bit position is
not needed on the host).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

LOG_SUM_PROBS = 12
GROUP_DIM_BLOCKS = 32  # blocks per group side
NZ_AREA = GROUP_DIM_BLOCKS * GROUP_DIM_BLOCKS

# zero-density context LUTs (ref block_context_map.rs:21-47)
_FREQ_CTX = np.array(
    [0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
     15, 15, 16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22,
     23, 23, 23, 23, 24, 24, 24, 24, 25, 25, 25, 25, 26, 26, 26, 26,
     27, 27, 27, 27, 28, 28, 28, 28, 29, 29, 29, 29, 30, 30, 30, 30],
    dtype=np.int32,
)
_NUM_NZ_CTX = np.array(
    [0, 0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123,
     152, 152, 152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180,
     180, 180, 180, 180, 180, 180, 180, 206, 206, 206, 206, 206, 206,
     206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
     206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206],
    dtype=np.int32,
)


@functools.partial(
    jax.jit, static_argnames=("log_bucket", "num_bctx", "total", "n_buckets")
)
def decode_ac_sections(
    streams,        # (S, L) uint8, zero-padded (>= 8 bytes slack)
    start_bits,     # (S,) i32 — bit offset of the ANS init state
    lane_group,     # (S,) i32 — row into `items` / nzmap slot
    lane_ctx_off,   # (S,) i32 — histogram_index * num_ac_contexts
    lane_shift,     # (S,) i32 — pass shift (coeff <<= shift)
    lane_order_base,  # (S,) i32 — base into `orders` for the lane's pass
    lane_coeff_base,  # (S,) i32 — base into the output coeff buffer
    lane_n_items,   # (S,) i32
    lane_end_bits,  # (S,) i32 — 8 * true byte length of each section
    items,          # (G, I, 10) i32: c, sbx, sby, num_blocks, num_coeffs,
                    #                 bctx, order_off, coeffs_off, cx, cy
    orders,         # (O,) i32 concatenated coeff orders (all passes)
    tables,         # (C, 5, NB) i32 packed alias tables
    uint_cfgs,      # (C, 3) i32
    context_map,    # (NC,) i32
    *,
    log_bucket: int,
    num_bctx: int,
    total: int,     # size of the coeff buffer (sentinel slot appended)
    n_buckets: int,
):
    """Decode every lane's AC token stream; returns (coeffs, ok) where
    coeffs is (total,) i32 and ok is (S,) bool (final-state checksum,
    stream-walk completion, and no range errors)."""
    S, L = streams.shape
    bucket_mask = (1 << log_bucket) - 1
    streams32 = streams.astype(jnp.uint32)
    tflat = tables.reshape(-1)
    freq_ctx = jnp.asarray(_FREQ_CTX)
    num_nz_ctx = jnp.asarray(_NUM_NZ_CTX)
    I = items.shape[1]
    items_flat = items.reshape(-1, 10)

    def read_bits(bitpos, nbits):
        """Per-lane LSB-first read of up to 32 bits at bit cursors."""
        def window16(bp):
            byte0 = (bp >> 3).astype(jnp.int32)
            idx = byte0[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]
            idx = jnp.clip(idx, 0, L - 1)
            b = jnp.take_along_axis(streams32, idx, axis=1)
            word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            return (word >> (bp & 7).astype(jnp.uint32)) & 0xFFFF

        lo = window16(bitpos)
        hi = window16(bitpos + 16)
        val32 = lo | (hi << 16)
        nb = nbits.astype(jnp.uint32)
        mask = jnp.where(nb >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb) - 1)
        return val32 & mask

    def table_at(row, cluster, i):
        return jnp.take(tflat, (cluster * 5 + row) * n_buckets + i, mode="clip")

    # initial 32-bit ANS state at start_bits
    init_state = read_bits(start_bits, jnp.full((S,), 32, jnp.int32))
    init_bitpos = start_bits + 32

    nzmap0 = jnp.zeros((S, 3, NZ_AREA), jnp.int32)
    coeffs0 = jnp.zeros(total + 1, jnp.int32)

    ar = jnp.arange(NZ_AREA, dtype=jnp.int32)
    nz_ys = ar // GROUP_DIM_BLOCKS
    nz_xs = ar % GROUP_DIM_BLOCKS

    def body(carry):
        (state, bitpos, item, k, nonzeros, prev, err, nzmap) = carry
        active = (item < lane_n_items) & ~err
        it = jnp.clip(item, 0, I - 1)
        row = lane_group * I + it
        f = items_flat[row]  # (S, 10) gather
        c = f[:, 0]
        sbx = f[:, 1]
        sby = f[:, 2]
        num_blocks = f[:, 3]
        num_coeffs = f[:, 4]
        bctx = f[:, 5]
        order_off = f[:, 6]
        coeffs_off = f[:, 7]
        lnb = 31 - jax.lax.clz(jnp.maximum(num_blocks, 1))  # log2(num_blocks)
        need_nz = k < 0

        # --- context selection -------------------------------------------
        # nonzeros prediction from the per-lane nzmap (top / left neighbors)
        ch_base = c * NZ_AREA
        up = jnp.take_along_axis(
            nzmap.reshape(S, -1),
            (ch_base + (sby - 1) * GROUP_DIM_BLOCKS + sbx)[:, None],
            axis=1,
        )[:, 0]
        left = jnp.take_along_axis(
            nzmap.reshape(S, -1),
            (ch_base + sby * GROUP_DIM_BLOCKS + jnp.maximum(sbx - 1, 0))[:, None],
            axis=1,
        )[:, 0]
        predicted = jnp.where(
            sbx == 0,
            jnp.where(sby == 0, 32, up),
            jnp.where(sby == 0, left, (up + left + 1) // 2),
        )
        nzctx = jnp.where(
            predicted < 8, predicted, jnp.where(predicted < 64, 4 + predicted // 2, 36)
        )
        ctx_nz = nzctx * num_bctx + bctx + lane_ctx_off

        nzl = jnp.minimum((nonzeros + (1 << lnb) - 1) >> lnb, 63)
        kn = jnp.clip(k, 0, 1 << 20) >> lnb
        histo_base = num_bctx * 37 + 458 * bctx + lane_ctx_off
        ctx_coef = (
            histo_base
            + (jnp.take(num_nz_ctx, nzl & 63) + jnp.take(freq_ctx, kn & 63)) * 2
            + prev
        )
        ctx = jnp.where(need_nz, ctx_nz, ctx_coef)
        ctx = jnp.where(active, ctx, 0)
        cluster = jnp.take(context_map, ctx, mode="clip")

        # --- ANS symbol + HybridUint -------------------------------------
        idx = state & 0xFFF
        i = (idx >> log_bucket).astype(jnp.int32)
        pos = (idx & bucket_mask).astype(jnp.int32)
        cut = table_at(3, cluster, i)
        use_alias = pos >= cut
        sym = jnp.where(use_alias, table_at(1, cluster, i), i)
        off = jnp.where(use_alias, table_at(2, cluster, i) + pos, pos)
        d = jnp.where(use_alias, table_at(4, cluster, i), table_at(0, cluster, i))
        nstate = (state >> LOG_SUM_PROBS) * d.astype(jnp.uint32) + off.astype(jnp.uint32)
        renorm = nstate < (1 << 16)
        bits16 = read_bits(bitpos, jnp.full((S,), 16, jnp.int32))
        nstate = jnp.where(renorm, (nstate << 16) | bits16, nstate)
        nbitpos = bitpos + jnp.where(renorm, 16, 0)

        token = sym.astype(jnp.uint32)
        se = jnp.take(uint_cfgs[:, 0], cluster).astype(jnp.uint32)
        msb = jnp.take(uint_cfgs[:, 1], cluster).astype(jnp.uint32)
        lsb = jnp.take(uint_cfgs[:, 2], cluster).astype(jnp.uint32)
        split = jnp.uint32(1) << se
        bit = msb + lsb
        nbits = ((se - bit + ((token - split) >> bit)) & 31).astype(jnp.int32)
        nbits = jnp.where(token < split, 0, nbits)
        raw = read_bits(nbitpos, nbits)
        nbitpos = nbitpos + nbits
        low = token & ((jnp.uint32(1) << lsb) - 1)
        token_nolow = token >> lsb
        hi = (token_nolow & ((jnp.uint32(1) << msb) - 1)) | (jnp.uint32(1) << msb)
        big = (((hi << nbits.astype(jnp.uint32)) | raw) << lsb) | low
        value = jnp.where(token < split, token, big)

        # --- nonzeros-token branch ---------------------------------------
        nz_val = value.astype(jnp.int32)
        bad_nz = need_nz & (nz_val + num_blocks > num_coeffs)
        fill = (nz_val + num_blocks - 1) // jnp.maximum(num_blocks, 1)
        # rect write: (cy, cx) cells starting at (sby, sbx) of channel c.
        # Nearly all steps write 1x1 rects (a cheap per-lane scatter); the
        # full masked rect update only runs on steps where some lane
        # places a multi-block transform's nonzeros token.
        do_write = need_nz & active & ~bad_nz
        cxv = f[:, 8]
        cyv = f[:, 9]

        def rect_update(m):
            in_rect = (
                (nz_ys[None, :] >= sby[:, None])
                & (nz_ys[None, :] < (sby + cyv)[:, None])
                & (nz_xs[None, :] >= sbx[:, None])
                & (nz_xs[None, :] < (sbx + cxv)[:, None])
            )
            write = do_write[:, None] & in_rect
            ch_sel = (
                jnp.arange(3, dtype=jnp.int32)[None, :, None] == c[:, None, None]
            )
            return jnp.where(write[:, None, :] & ch_sel, fill[:, None, None], m)

        def cell_update(m):
            flat_idx = jnp.where(
                do_write,
                (c * NZ_AREA + sby * GROUP_DIM_BLOCKS + sbx),
                3 * NZ_AREA,
            )
            return (
                m.reshape(S, -1)
                .at[jnp.arange(S), flat_idx]
                .set(jnp.where(do_write, fill, 0), mode="drop")
                .reshape(S, 3, NZ_AREA)
            )

        any_multi = jnp.any(do_write & (num_blocks > 1))
        nnzmap = jax.lax.cond(any_multi, rect_update, cell_update, nzmap)
        prev_init = jnp.where(nz_val > (num_coeffs >> 4), 0, 1)

        # --- coefficient-token branch ------------------------------------
        uval = value
        coeff = jnp.where(
            (uval & 1) == 1, -((uval + 1) >> 1).astype(jnp.int32), (uval >> 1).astype(jnp.int32)
        )
        coeff = coeff << lane_shift
        emit = active & ~need_nz
        ordv = jnp.take(
            orders, lane_order_base + order_off + jnp.maximum(k, 0), mode="clip"
        )
        dest = jnp.where(emit, lane_coeff_base + coeffs_off + ordv, total)
        val = jnp.where(emit, coeff, 0)

        is_nonzero = (coeff != 0) & emit
        nz_after = nonzeros - is_nonzero.astype(jnp.int32)

        # --- transitions --------------------------------------------------
        start_coeffs = need_nz & (nz_val > 0) & ~bad_nz
        skip_item = need_nz & (nz_val == 0) & ~bad_nz
        coeffs_exhausted = emit & (nz_after > 0) & (k + 1 >= num_coeffs)
        coeffs_done = emit & ((nz_after == 0) | (k + 1 >= num_coeffs))
        nerr = err | (active & (bad_nz | coeffs_exhausted))
        advance = (skip_item | coeffs_done) & active
        nitem = item + advance.astype(jnp.int32)
        nk = jnp.where(
            advance, -1, jnp.where(start_coeffs, num_blocks, jnp.where(emit, k + 1, k))
        )
        nnonzeros = jnp.where(start_coeffs, nz_val, jnp.where(emit, nz_after, nonzeros))
        nprev = jnp.where(need_nz, prev_init, is_nonzero.astype(jnp.int32))
        nprev = jnp.where(active, nprev, prev)

        # masked lanes keep their decoder state
        nstate = jnp.where(active, nstate, state)
        nbitpos = jnp.where(active, nbitpos, bitpos)
        nitem = jnp.where(active, nitem, item)
        nk = jnp.where(active, nk, k)
        nnonzeros = jnp.where(active, nnonzeros, nonzeros)
        return (nstate, nbitpos, nitem, nk, nnonzeros, nprev, nerr, nnzmap), (
            dest,
            val,
        )

    # CHUNK tokens per outer iteration: the scan emits (dest, val) pairs and
    # one batched scatter-add per chunk applies them — a per-token scatter
    # into the (multi-MB) coefficient buffer is what TPUs do worst.
    CHUNK = 1024

    def outer_cond(carry):
        inner, coeffs = carry
        item, err = inner[2], inner[6]
        return jnp.any((item < lane_n_items) & ~err)

    def outer_body(carry):
        inner, coeffs = carry
        inner, (dests, vals) = jax.lax.scan(
            lambda c, _: body(c), inner, None, length=CHUNK
        )
        coeffs = coeffs.at[dests.reshape(-1)].add(vals.reshape(-1), mode="drop")
        return (inner, coeffs)

    inner0 = (
        init_state,
        init_bitpos,
        jnp.zeros((S,), jnp.int32),
        jnp.full((S,), -1, jnp.int32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.bool_),
        nzmap0,
    )
    (inner, coeffs) = jax.lax.while_loop(
        outer_cond, outer_body, (inner0, coeffs0)
    )
    (state, bitpos, item, k, nonzeros, prev, err, nzmap) = inner
    ok = (~err) & (item >= lane_n_items) & (state == jnp.uint32(0x130000))
    # overrun check: the cursor must stay within the real stream bytes
    ok &= bitpos <= lane_end_bits
    return coeffs[:total], ok
