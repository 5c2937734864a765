"""Device execution of stage spans: one fused jit program per span.

The render-pipeline analog of the reference's per-stage row dispatch
(render/low_memory_pipeline/run_stage.rs) — on TPU a contiguous run of
device_ok stages lowers to a single XLA program (stages fuse into a few
HBM passes), cached by the span's configuration key so animation frames
and repeated shapes reuse the compiled executable.
"""

from __future__ import annotations

import numpy as np

from .pipeline import pipeline_key, run_stages

_CACHE: dict = {}


def run_span_device(span, planes, ctx, num_color=None):
    """Run `span` (list of Stage) over `planes` as one jit program.

    ctx entries are passed as traced arguments (per-frame data); stage
    configuration is baked in via closures, keyed by pipeline_key.
    Returns a list of host-side numpy arrays (single download).
    """
    import jax
    import jax.numpy as jnp

    ctx = ctx or {}
    ctx_keys = tuple(sorted(ctx))
    key = (pipeline_key(span), ctx_keys, len(planes))
    fn = _CACHE.get(key)
    if fn is None:

        def prog(chans, ctx_vals):
            with jax.default_matmul_precision("float32"):
                c = dict(zip(ctx_keys, ctx_vals))
                out = run_stages(jnp, span, list(chans), c)
            return tuple(out)

        fn = jax.jit(prog)
        _CACHE[key] = fn

    chans_in = tuple(jnp.asarray(p) for p in planes)
    # thunk entries (lazily-materialized per-frame data, e.g. dense patch
    # layers) resolve only when a device program actually dispatches
    ctx_vals = tuple(
        ctx[k]() if callable(ctx[k]) else ctx[k] for k in ctx_keys
    )
    out = fn(chans_in, ctx_vals)
    return [np.array(jax.device_get(o)) for o in out]
