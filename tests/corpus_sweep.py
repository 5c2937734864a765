"""Ad-hoc sweep: compare every corpus file's decode against libjxl.

Run: python tests/corpus_sweep.py [pattern]
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))
import numpy as np

from libjxl_ref import decode_ref
from jxl_tpu.api.decoder import JxlDecoder, Event

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def our_decode(data):
    d = JxlDecoder()
    d.feed(data)
    d.end_input()
    while d.process() is not Event.COMPLETE:
        pass
    return d


def compare(name: str):
    data = (CORPUS / name).read_bytes()
    d = our_decode(data)
    meta = d.file_header.image_metadata
    want_srgb = meta.color_encoding.want_icc and meta.xyb_encoded
    refs, info = decode_ref(data, prefer_srgb=want_srgb)
    if len(refs) != len(d.frames):
        return f"FRAMECOUNT ours={len(d.frames)} ref={len(refs)}"
    worst = 0.0
    gray = info.num_color_channels == 1
    # libjxl's interleaved output is color channels + ALPHA (if any); our
    # frames carry color + ALL extra channels in signaled order
    from jxl_tpu.io.headers import ExtraChannel

    alpha_idx = next(
        (
            i
            for i, e in enumerate(meta.extra_channel_info)
            if e.ec_type == ExtraChannel.ALPHA
        ),
        None,
    )
    for ours, ref in zip(d.frames, refs):
        if gray:
            pairs = [(0, 0)]
            if ref.shape[-1] > 1 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 1))
        else:
            pairs = [(c, c) for c in range(min(3, ref.shape[-1]))]
            if ref.shape[-1] > 3 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 3))
        if ours.shape[:2] != ref.shape[:2]:
            return f"SHAPE ours={ours.shape} ref={ref.shape}"
        for oc, rc in pairs:
            # libjxl clamps negative linear to 0 (jxl-rs, and we, keep
            # negatives); compare with both sides clamped
            a = np.maximum(ours[..., oc], 0.0)
            b = np.maximum(ref[..., rc], 0.0)
            mse = float(((a - b) ** 2).mean())
            worst = max(worst, mse)
    return worst


def main():
    pats = sys.argv[1:]
    files = sorted(
        str(p.relative_to(CORPUS))
        for p in list(CORPUS.glob("*.jxl")) + list(CORPUS.glob("conformance_test_images/*.jxl"))
    )
    if pats:
        files = [f for f in files if any(p in f for p in pats)]
    bad = []
    for f in files:
        t0 = time.time()
        try:
            r = compare(f)
        except Exception as e:
            r = f"ERR {type(e).__name__}: {e}"
        dt = time.time() - t0
        flag = ""
        if isinstance(r, float):
            flag = "OK " if r < 1e-7 else "BAD"
            if r >= 1e-7:
                bad.append((f, r))
        else:
            flag = "??? "
            bad.append((f, r))
        print(f"{flag:4s} {f:60s} {r if isinstance(r, str) else f'{r:.3e}'} ({dt:.1f}s)", flush=True)
    print("\n== files needing attention:", len(bad))
    for f, r in bad:
        print(" ", f, r)


if __name__ == "__main__":
    main()
