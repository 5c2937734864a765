"""Batched rANS decode on device: scalar per stream, wide across streams.

SURVEY §7's entropy plan: rANS state is a serial chain within a stream, so
device parallelism comes from decoding MANY streams in lockstep — each VPU
lane carries one stream's 32-bit state, alias-table lookups become lane
gathers, and renormalization gathers each lane's next 16 bits from its own
byte cursor. One `lax.scan` step decodes one symbol per stream.

Math mirrors entropy/ans.py AnsHistogram.read exactly (12-bit alias rANS,
16-bit renorm, ref entropy_coding/ans.rs:354-393). This op covers the
fixed-context symbol stage; context modeling / HybridUint / LZ77 remain
host-side (the full on-device section decoder is follow-up work).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

LOG_SUM_PROBS = 12
SUM_PROBS = 1 << LOG_SUM_PROBS


def pack_table(hist) -> np.ndarray:
    """(5, n_buckets) int32: dist, alias_symbol, alias_offset, alias_cutoff,
    alias_dist (entropy/ans.py layout)."""
    n = len(hist.alias_symbol)
    dist = list(hist.dist) + [0] * (n - len(hist.dist))
    return np.array(
        [dist[:n], hist.alias_symbol, hist.alias_offset, hist.alias_cutoff,
         hist.alias_dist],
        dtype=np.int32,
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def ans_decode_batch(streams, table, log_bucket_size: int, num_tokens: int):
    """Decode `num_tokens` symbols from each of S streams in lockstep.

    streams: (S, L) uint8 (each starts with the 32-bit initial state,
    LSB-first, then renorm bits); table: (5, n_buckets) int32.
    Returns (tokens (S, T) int32, final_states (S,) uint32).
    """
    s_count, length = streams.shape
    bucket_mask = (1 << log_bucket_size) - 1
    dist = table[0]
    alias_symbol = table[1]
    alias_offset = table[2]
    alias_cutoff = table[3]
    alias_dist = table[4]
    streams32 = streams.astype(jnp.uint32)

    def read_bits16(bitpos):
        byte0 = (bitpos >> 3).astype(jnp.int32)
        idx = byte0[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]
        idx = jnp.minimum(idx, length - 1)
        b = jnp.take_along_axis(streams32, idx, axis=1)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        return (word >> (bitpos & 7).astype(jnp.uint32)) & 0xFFFF

    # initial state: first 32 bits, LSB-first
    init_state = (
        streams32[:, 0]
        | (streams32[:, 1] << 8)
        | (streams32[:, 2] << 16)
        | (streams32[:, 3] << 24)
    )
    init_bitpos = jnp.full((s_count,), 32, dtype=jnp.int32)

    def step(carry, _):
        state, bitpos = carry
        idx = state & 0xFFF
        i = (idx >> log_bucket_size).astype(jnp.int32)
        pos = (idx & bucket_mask).astype(jnp.int32)
        cut = jnp.take(alias_cutoff, i)
        use_alias = pos >= cut
        sym = jnp.where(use_alias, jnp.take(alias_symbol, i), i)
        off = jnp.where(use_alias, jnp.take(alias_offset, i) + pos, pos)
        d = jnp.where(use_alias, jnp.take(alias_dist, i), jnp.take(dist, i))
        state = (state >> LOG_SUM_PROBS) * d.astype(jnp.uint32) + off.astype(
            jnp.uint32
        )
        renorm = state < (1 << 16)
        bits = read_bits16(bitpos)
        state = jnp.where(renorm, (state << 16) | bits, state)
        bitpos = bitpos + jnp.where(renorm, 16, 0)
        return (state, bitpos), sym

    (state, _), toks = jax.lax.scan(
        step, (init_state, init_bitpos), None, length=num_tokens
    )
    return toks.T, state


def pack_clustered_tables(histograms) -> np.ndarray:
    """(C, 5, n_buckets) int32 from a list of AnsHistogram."""
    return np.stack([pack_table(h) for h in histograms])


def pack_uint_configs(configs) -> np.ndarray:
    """(C, 3) int32: split_exponent, msb_in_token, lsb_in_token."""
    return np.array(
        [[c.split_exponent, c.msb_in_token, c.lsb_in_token] for c in configs],
        dtype=np.int32,
    )


@functools.partial(jax.jit, static_argnums=(4, 5))
def ans_read_uint_batch(
    streams, tables, uint_cfgs, clusters, log_bucket_size: int, num_tokens: int
):
    """Clustered ANS + HybridUint: decode `num_tokens` unsigned values per
    stream, with a per-(stream, step) cluster index.

    streams: (S, L) uint8; tables: (C, 5, NB) int32; uint_cfgs: (C, 3)
    int32; clusters: (S, T) int32. Returns (values (S, T) uint32,
    final_states (S,) uint32).

    This is the full ANS symbol + HybridUint tail-bit stage of
    SymbolReader::read_unsigned_clustered (ref entropy_coding/decode.rs:271),
    in lane-per-stream lockstep; context selection stays with the caller.
    """
    s_count, length = streams.shape
    n_buckets = tables.shape[2]
    bucket_mask = (1 << log_bucket_size) - 1
    streams32 = streams.astype(jnp.uint32)
    tflat = tables.reshape(-1)  # (C*5*NB)

    def read_bits(bitpos, nbits):
        """Per-lane read of `nbits` (<=32) LSB-first bits at bit cursors."""
        def window16(bp):
            byte0 = (bp >> 3).astype(jnp.int32)
            idx = byte0[:, None] + jnp.arange(3, dtype=jnp.int32)[None, :]
            idx = jnp.minimum(idx, length - 1)
            b = jnp.take_along_axis(streams32, idx, axis=1)
            word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            return (word >> (bp & 7).astype(jnp.uint32)) & 0xFFFF

        lo = window16(bitpos)
        hi = window16(bitpos + 16)
        val32 = lo | (hi << 16)
        nb = nbits.astype(jnp.uint32)
        mask = jnp.where(
            nb >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << nb) - 1
        )
        return val32 & mask

    def table_at(row, cluster, i):
        return jnp.take(tflat, cluster * 5 * n_buckets + row * n_buckets + i)

    init_state = (
        streams32[:, 0]
        | (streams32[:, 1] << 8)
        | (streams32[:, 2] << 16)
        | (streams32[:, 3] << 24)
    )
    init_bitpos = jnp.full((s_count,), 32, dtype=jnp.int32)

    def step(carry, cluster):
        state, bitpos = carry
        idx = state & 0xFFF
        i = (idx >> log_bucket_size).astype(jnp.int32)
        pos = (idx & bucket_mask).astype(jnp.int32)
        cut = table_at(3, cluster, i)
        use_alias = pos >= cut
        sym = jnp.where(use_alias, table_at(1, cluster, i), i)
        off = jnp.where(use_alias, table_at(2, cluster, i) + pos, pos)
        d = jnp.where(use_alias, table_at(4, cluster, i), table_at(0, cluster, i))
        state = (state >> LOG_SUM_PROBS) * d.astype(jnp.uint32) + off.astype(
            jnp.uint32
        )
        renorm = state < (1 << 16)
        bits16 = read_bits(bitpos, jnp.full_like(bitpos, 16))
        state = jnp.where(renorm, (state << 16) | bits16, state)
        bitpos = bitpos + jnp.where(renorm, 16, 0)

        # HybridUint (ref hybrid_uint.rs:28-71)
        token = sym.astype(jnp.uint32)
        se = jnp.take(uint_cfgs[:, 0], cluster).astype(jnp.uint32)
        msb = jnp.take(uint_cfgs[:, 1], cluster).astype(jnp.uint32)
        lsb = jnp.take(uint_cfgs[:, 2], cluster).astype(jnp.uint32)
        split = jnp.uint32(1) << se
        bit = msb + lsb
        nbits = (se - bit + ((token - split) >> bit)).astype(jnp.int32)
        nbits = jnp.where(token < split, 0, nbits)
        raw = read_bits(bitpos, nbits)
        bitpos = bitpos + jnp.where(token < split, 0, nbits)
        low = token & ((jnp.uint32(1) << lsb) - 1)
        token_nolow = token >> lsb
        hi = (token_nolow & ((jnp.uint32(1) << msb) - 1)) | (jnp.uint32(1) << msb)
        big = (((hi << nbits.astype(jnp.uint32)) | raw) << lsb) | low
        value = jnp.where(token < split, token, big)
        return (state, bitpos), value

    (state, _), vals = jax.lax.scan(
        step, (init_state, init_bitpos), clusters.T, length=num_tokens
    )
    return vals.T, state
