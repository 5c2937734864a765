"""Malformed-input robustness (the reference's fuzz targets, jxl/fuzz/
fuzz_targets/decode.rs, as a deterministic property suite).

Every mutation of a valid file must either decode or raise a typed
JxlError — never crash, hang, or blow up memory (the reference's
Error::OutOfBounds / sample_limit guards, error.rs + codestream_parser
:61-74)."""

import pathlib
import random

import numpy as np
import pytest

from jxl_tpu.api.decoder import Event, JxlDecoder, JxlDecoderOptions
from jxl_tpu.errors import JxlError

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")

SEEDS = ["3x3_srgb_lossless.jxl", "3x3_srgb_lossy.jxl", "basic.jxl",
         "stp2_520x260_d25_e6.jxl"]


def try_decode(data: bytes) -> str:
    d = JxlDecoder(JxlDecoderOptions(sample_limit=1 << 24))
    try:
        d.feed(data)
        d.end_input()
        steps = 0
        while d.process() is not Event.COMPLETE:
            steps += 1
            assert steps < 100_000, "decoder did not terminate"
        for fr in d.frames:
            assert fr.size < (1 << 26), "output too large"
        return "ok"
    except JxlError:
        return "error"
    except (OverflowError, MemoryError):
        return "resource"


@pytest.mark.parametrize("name", SEEDS)
def test_bitflip_fuzz(name):
    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    data = bytearray(path.read_bytes())
    rng = random.Random(1234)
    for _ in range(60):
        mutated = bytearray(data)
        for _ in range(rng.randint(1, 8)):
            pos = rng.randrange(len(mutated))
            mutated[pos] ^= 1 << rng.randrange(8)
        try_decode(bytes(mutated))  # must not crash/hang


@pytest.mark.parametrize("name", SEEDS[:2])
def test_truncation_fuzz(name):
    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    data = path.read_bytes()
    for n in range(0, len(data), max(1, len(data) // 40)):
        try_decode(data[:n])


def test_random_garbage():
    rng = np.random.default_rng(7)
    for size in (0, 1, 2, 11, 64, 1024):
        try_decode(rng.integers(0, 256, size, dtype=np.uint8).tobytes())
    # valid signature + garbage body
    for size in (16, 256, 4096):
        body = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        try_decode(b"\xff\x0a" + body)


def test_untrusted_toc_no_huge_alloc():
    """A TOC claiming huge sections must not allocate upfront
    (ref frame_info.rs:276,370-381)."""
    path = CORPUS / "basic.jxl"
    if not path.exists():
        pytest.skip("corpus not available")
    data = bytearray(path.read_bytes())
    # corrupt bytes in the TOC area; decoder must fail cleanly or decode
    for off in range(20, min(40, len(data))):
        mutated = bytearray(data)
        mutated[off] = 0xFF
        try_decode(bytes(mutated))


def _rss_mb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


@pytest.mark.slow
@pytest.mark.parametrize("name", SEEDS + [
    "has_permutation.jxl",
    "with_icc.jxl",
    "gray_alpha_lossless.jxl",
    "8x8_noise.jxl",
])
def test_bitflip_fuzz_deep(name):
    """10x the fast tier's mutation count, with wall-clock and RSS guards
    (the deterministic analog of the reference's continuous libfuzzer
    decode target, jxl/fuzz/fuzz_targets/decode.rs)."""
    import time

    path = CORPUS / name
    if not path.exists():
        pytest.skip("corpus not available")
    data = bytearray(path.read_bytes())
    rng = random.Random(98765)
    rss_before = _rss_mb()
    for i in range(600):
        mutated = bytearray(data)
        for _ in range(rng.randint(1, 12)):
            pos = rng.randrange(len(mutated))
            mutated[pos] ^= 1 << rng.randrange(8)
        t0 = time.perf_counter()
        try_decode(bytes(mutated))
        assert time.perf_counter() - t0 < 30, f"hang on mutation {i}"
    assert _rss_mb() - rss_before < 2048, "fuzzing leaked >2GB RSS"


@pytest.mark.slow
def test_byte_splice_fuzz():
    """Cross-file byte splices: chunks of one valid file inserted into
    another exercise header/TOC/section boundary confusion."""
    import time

    a = (CORPUS / SEEDS[0]).read_bytes()
    b = (CORPUS / SEEDS[3]).read_bytes()
    rng = random.Random(42)
    for i in range(200):
        cut_a = rng.randrange(len(a))
        cut_b = rng.randrange(len(b))
        ln = rng.randrange(1, 64)
        mutated = a[:cut_a] + b[cut_b : cut_b + ln] + a[cut_a:]
        t0 = time.perf_counter()
        try_decode(mutated)
        assert time.perf_counter() - t0 < 30, f"hang on splice {i}"
