#!/usr/bin/env python
"""Decode benchmark: prints ONE JSON line with decode MP/s.

Measures end-to-end decode (host entropy/modular + device render) over
BASELINE.json-style configs using the reference corpus. The north-star
metric is decode MP/s per chip.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def bench_device_render(reps: int = 20) -> dict:
    """Device render pipeline throughput on a 1024x1024 frame (per chip)."""
    import jax

    from jxl_tpu.ops.device_render import RenderParams, jit_render

    params = RenderParams()
    fn = jit_render(params)
    rng = np.random.default_rng(0)
    planes = jax.device_put(rng.normal(size=(3, 1024, 1024)).astype(np.float32))
    sigma = jax.device_put(np.full((128, 128), -2.0, dtype=np.float32))
    jax.block_until_ready(fn(planes, sigma))  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(planes, sigma)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    mp = 1024 * 1024 / 1e6
    return {"render_mps": mp / dt}


def bench_full_decode() -> dict:
    """End-to-end decode MP/s on a real VarDCT photo."""
    from jxl_tpu.api.simple import decode_first_frame
    from jxl_tpu.render.simple import render_frame

    data = (CORPUS / "green_queen_vardct_e3.jxl").read_bytes()
    t0 = time.perf_counter()
    df = decode_first_frame(data)
    out = render_frame(df.frame)
    dt = time.perf_counter() - t0
    mp = out.shape[0] * out.shape[1] / 1e6
    return {"decode_mps": mp / dt}


def main():
    result = {}
    try:
        result.update(bench_device_render())
    except Exception as e:  # pragma: no cover
        result["render_error"] = str(e)[:100]
    try:
        result.update(bench_full_decode())
    except Exception as e:  # pragma: no cover
        result["decode_error"] = str(e)[:100]

    value = result.get("decode_mps", 0.0)
    print(
        json.dumps(
            {
                "metric": "decode_mps",
                "value": round(value, 4),
                "unit": "MP/s",
                "vs_baseline": 0.0,
                "detail": {k: round(v, 3) if isinstance(v, float) else v for k, v in result.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
