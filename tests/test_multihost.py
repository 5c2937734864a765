"""Multi-host DCN frame pipelining dryrun: 2 jax.distributed processes on
CPU (gloo collectives) decode an animation with frames split across hosts;
the result must equal the single-host decode exactly (SURVEY §2.3)."""

import multiprocessing as mp
import os
import pathlib
import sys

import numpy as np
import pytest

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")
ANIM = CORPUS / "conformance_test_images/animation_icos4d.jxl"


def _worker(pid, nproc, port, q):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JXL_TPU_JIT_CACHE"] = "off"
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jxl_tpu.parallel.multihost import (
            decode_animation_multihost,
            init_distributed,
        )

        init_distributed(f"localhost:{port}", nproc, pid)
        frames = decode_animation_multihost(ANIM.read_bytes())
        # return a compact digest per frame to keep the queue payload small
        digest = np.stack([f.mean(axis=(0, 1)) for f in frames])
        full0 = frames[0]
        full_last = frames[-1]
        q.put((pid, len(frames), digest, full0, full_last))
    except Exception as e:  # pragma: no cover
        import traceback

        q.put((pid, -1, f"{type(e).__name__}: {e}\n{traceback.format_exc()[-600:]}", None, None))


@pytest.mark.slow
def test_multihost_animation_pipeline():
    if not ANIM.exists():
        pytest.skip("corpus not available")
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(i, 2, 12757, q)) for i in range(2)]
    for p in procs:
        p.start()
    results = {}
    try:
        for _ in range(2):
            pid, nf, digest, f0, flast = q.get(timeout=540)
            assert nf != -1, f"worker {pid} failed: {digest}"
            results[pid] = (nf, digest, f0, flast)
    finally:
        for p in procs:
            p.join(timeout=60)
            if p.is_alive():
                p.terminate()

    # both hosts computed the identical full animation
    assert results[0][0] == results[1][0]
    np.testing.assert_array_equal(results[0][1], results[1][1])

    # equals the single-host decode
    from jxl_tpu.api.simple import decode_image

    ref = decode_image(ANIM.read_bytes())
    nf, digest, f0, flast = results[0]
    assert nf == len(ref.frames)
    np.testing.assert_allclose(f0, ref.frames[0][..., :3], atol=1e-6)
    np.testing.assert_allclose(flast, ref.frames[-1][..., :3], atol=1e-6)
    ref_digest = np.stack([f[..., :3].mean(axis=(0, 1)) for f in ref.frames])
    np.testing.assert_allclose(digest, ref_digest, atol=1e-6)
