"""Pallas TPU kernel: lockstep batched rANS symbol decode, tables in VMEM.

The XLA formulation (ops/device_ans.py ans_decode_batch) decodes one
symbol per stream per `lax.scan` step; at small lane counts its cost is
dominated by generic gathers (alias-table rows and per-lane renorm bytes
lower to gather ops that cost microseconds each on tiny shapes — measured
~22 us/step at 20 lanes, NOTES_ROUND2 §5). This kernel runs the whole
token loop INSIDE one Pallas program with every table VMEM-resident and
expresses the per-lane lookups as one-hot masked INTEGER sums — the
shape the VPU executes natively — instead of gathers:

  - alias row fetch: where(iota == bucket_i, table_col, 0) summed over
    the bucket axis, one int32 select+reduce per table column
  - renorm read: streams are repacked host-side as 16-bit words (rANS
    renorm positions are always 16-bit aligned after the 32-bit init), so
    each lane's next bits are where(iota == word_idx, words, 0) summed
    over the word axis

An earlier formulation used f32 one-hot MATMULS for both lookups; on
real TPUs Mosaic routes large-S contractions to the MXU with bf16
passes, which silently rounds 16-bit renorm words (>8 mantissa bits) —
bit-exact at S<=64, input-dependently wrong at S=128. Integer select+
reduce is exact at every shape.

Semantics: identical to ans_decode_batch / entropy/ans.py AnsHistogram
.read (12-bit alias rANS, 16-bit renorm; ref entropy_coding/ans.rs:354-393).
Correctness is gated in interpret mode against the XLA twin
(tests/test_pallas_ans.py); `bench_step_cost()` measures the per-step
cost on real hardware for the auto lane-count threshold.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LOG_SUM_PROBS = 12
SUM_PROBS = 1 << LOG_SUM_PROBS


def _words16(streams: jnp.ndarray) -> jnp.ndarray:
    """(S, L) uint8 -> (S, ceil(L/2)) int32 little-endian 16-bit words."""
    s, l = streams.shape
    if l % 2:
        streams = jnp.pad(streams, ((0, 0), (0, 1)))
        l += 1
    u = streams.astype(jnp.int32).reshape(s, l // 2, 2)
    return u[:, :, 0] | (u[:, :, 1] << 8)


def _kernel(words_ref, table_ref, out_ref, state_out_ref, *, S, W, NB,
            log_bucket, T):
    mask = (1 << log_bucket) - 1
    words = words_ref[:]  # (S, W) int32; values < 2^16
    table = table_ref[:]  # (NB, 5) int32; values < 2^24
    # initial state: first two 16-bit words, LSB-first
    w0 = words_ref[:, 0].astype(jnp.uint32)
    w1 = words_ref[:, 1].astype(jnp.uint32)
    state0 = w0 | (w1 << 16)
    wpos0 = jnp.full((S,), 2, dtype=jnp.int32)

    nb_iota = jax.lax.broadcasted_iota(jnp.int32, (S, NB), 1)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (S, W), 1)

    def body(t, carry):
        state, wpos = carry
        idx = (state & jnp.uint32(0xFFF)).astype(jnp.int32)
        i = idx >> log_bucket
        pos = idx & mask
        onehot = nb_iota == i[:, None]  # (S, NB) bool

        def pick(col):
            return jnp.sum(
                jnp.where(onehot, table[:, col][None, :], 0), axis=1
            )

        dist = pick(0)
        asym = pick(1)
        aoff = pick(2)
        acut = pick(3)
        adist = pick(4)
        use_alias = pos >= acut
        sym = jnp.where(use_alias, asym, i)
        off = jnp.where(use_alias, aoff + pos, pos)
        d = jnp.where(use_alias, adist, dist)
        state = (state >> jnp.uint32(LOG_SUM_PROBS)) * d.astype(jnp.uint32) + off.astype(jnp.uint32)
        renorm = state < jnp.uint32(1 << 16)
        bits = jnp.sum(
            jnp.where(w_iota == wpos[:, None], words, 0), axis=1
        ).astype(jnp.uint32)
        state = jnp.where(renorm, (state << jnp.uint32(16)) | bits, state)
        wpos = wpos + jnp.where(renorm, 1, 0)
        out_ref[pl.dslice(t, 1), :] = sym[None, :]
        return state, wpos

    state, _ = jax.lax.fori_loop(0, T, body, (state0, wpos0))
    state_out_ref[:] = state


def ans_decode_batch_pallas(streams, table, log_bucket_size: int,
                            num_tokens: int, interpret: bool | None = None):
    """Pallas twin of device_ans.ans_decode_batch.

    streams: (S, L) uint8; table: (5, n_buckets) int32.
    Returns (tokens (S, T) int32, final_states (S,) uint32).
    interpret defaults to True on the CPU backend (tests/dryrun), False
    on real TPUs."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _decode_jit(streams, table, log_bucket_size, num_tokens,
                       bool(interpret))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _decode_jit(streams, table, log_bucket_size: int, num_tokens: int,
                interpret: bool):
    S, L = streams.shape
    words = _words16(jnp.asarray(streams))
    W = words.shape[1]
    NB = table.shape[1]
    table_f = jnp.asarray(table.T, dtype=jnp.int32)  # (NB, 5)
    out, state = pl.pallas_call(
        functools.partial(
            _kernel, S=S, W=W, NB=NB, log_bucket=log_bucket_size,
            T=num_tokens,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((num_tokens, S), jnp.int32),
            jax.ShapeDtypeStruct((S,), jnp.uint32),
        ),
        interpret=interpret,
    )(words, table_f)
    return out.T, state


def bench_step_cost(s_count: int = 32, num_tokens: int = 2048, reps: int = 5):
    """Per-token-step cost (seconds) of the Pallas kernel vs the XLA scan
    at `s_count` lanes, on whatever backend is active. Used to calibrate
    the JXL_TPU_AC auto threshold on real hardware."""
    import time

    from .device_ans import ans_decode_batch, pack_table
    from ..entropy.ans import AnsHistogram  # noqa: F401 (alias-table builder)

    rng = np.random.default_rng(0)
    # geometric-ish distribution over 40 symbols, normalized to SUM_PROBS
    counts = np.maximum((SUM_PROBS * (0.5 ** np.arange(40))).astype(int), 1)
    counts[0] += SUM_PROBS - counts.sum()
    h = AnsHistogram.__new__(AnsHistogram)
    h.dist = [int(c) for c in counts] + [0] * (256 - len(counts))
    h.log_bucket_size = LOG_SUM_PROBS - 8  # 256 buckets
    h.bucket_mask = (1 << h.log_bucket_size) - 1
    h.single_symbol = None
    h._build_alias_map(SUM_PROBS >> h.log_bucket_size, 1 << h.log_bucket_size)
    table = pack_table(h)
    streams = rng.integers(0, 256, size=(s_count, 32 + num_tokens * 2),
                           dtype=np.uint8)
    results = {}
    for name, fn in (
        ("xla", lambda: ans_decode_batch(streams, table, h.log_bucket_size,
                                         num_tokens)),
        ("pallas", lambda: ans_decode_batch_pallas(
            streams, table, h.log_bucket_size, num_tokens)),
    ):
        toks, st = fn()
        jax.block_until_ready((toks, st))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        results[name] = best / num_tokens
    return results
