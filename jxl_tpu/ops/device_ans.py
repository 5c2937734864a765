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
