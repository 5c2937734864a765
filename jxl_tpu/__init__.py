"""jxl_tpu — a TPU-native JPEG XL decode engine.

Built from scratch for JAX/XLA/Pallas. Host side (Python/C++) handles
bitstream parsing, headers, and entropy table setup; the device side
(JAX + Pallas) handles the pixel math: inverse transforms, dequant,
chroma-from-luma, restoration filters, upsampling and color conversion,
sharded group-parallel over a TPU mesh with halo collectives.

Capability reference: libjxl/jxl-rs (see SURVEY.md). This is not a port:
the architecture is host-planner + pure device programs per frame shape.
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Keep freed large buffers in the process heap instead of returning
    them to the OS. On this container a fresh-page first touch runs at
    ~0.15-1.3 GB/s (per-page fault cost) while warm pages stream at
    ~8 GB/s; glibc's default 128 KiB mmap threshold makes every large
    numpy temporary pay the fault cost again. Raising the mmap/trim
    thresholds turns repeat decodes' big allocations into warm-heap
    reuse (measured 40x on a 200 MB alloc+fill). Opt out with
    JXL_TPU_MALLOC=default (e.g. for strict RSS accounting)."""
    import os

    if os.environ.get("JXL_TPU_MALLOC", "") == "default":
        return
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: big allocs via brk
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: never trim to OS
    except Exception:
        pass


_tune_malloc()


_jit_cache_enabled = False


def enable_persistent_jit_cache(path: str | None = None) -> None:
    """Persist compiled XLA executables across processes. Remote TPU
    compiles cost tens of seconds per (config, shape-bucket); the disk
    cache removes that for repeat CLI/bench invocations. Called
    automatically at every API entry point; set JXL_TPU_JIT_CACHE=off to
    disable."""
    global _jit_cache_enabled
    if _jit_cache_enabled:
        return
    import os

    import jax

    env = os.environ.get("JXL_TPU_JIT_CACHE", "")
    if env == "off":
        _jit_cache_enabled = True
        return
    cache = path or env or os.path.expanduser("~/.cache/jxl_tpu_jit")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jit_cache_enabled = True

GROUP_DIM = 256        # pixels per (HF) group side; ref: jxl/src/lib.rs:24
LF_GROUP_DIM = 2048    # pixels per LF group side (GROUP_DIM * 8)
BLOCK_DIM = 8
