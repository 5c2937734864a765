#!/usr/bin/env python
"""Corpus-wide device-lane eligibility report for lossless Modular.

Decodes every Modular-encoded corpus file with the device lossless lanes
forced on (JXL_TPU_DEV_LOSSLESS=1) and tallies where each modular pixel
went (VERDICT r04 #3; ref specialized_trees.rs:413 lattice shares):

- device:     channel-static West/North/Gradient streams reconstructed
              by the batched device lanes (residual entropy on host)
- identity:   channel-static Zero streams — residuals ARE the pixels, so
              there is nothing to reconstruct anywhere
- host:       eligible streams that tripped the int32-overflow gate
- ineligible: stream shapes the lanes cannot take (WP / property-
              dependent trees, local transforms, oversize, tiny)

Run: JAX_PLATFORMS=cpu python ci/lossless_eligibility.py [--json out]
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--files", nargs="*", default=None)
    args = ap.parse_args()

    os.environ["JXL_TPU_DEV_LOSSLESS"] = "1"
    os.environ["JXL_TPU_TRACE"] = "1"

    from jxl_tpu.api.simple import decode_image
    from jxl_tpu.utils import trace

    files = (
        [CORPUS / f for f in args.files]
        if args.files
        else sorted(CORPUS.rglob("*.jxl"))
    )
    keys = ("px_device", "px_identity", "px_host", "px_ineligible")
    rows = []
    totals = dict.fromkeys(keys, 0)
    for path in files:
        trace.metrics.reset()
        try:
            decode_image(path.read_bytes())
        except Exception:
            continue  # invalid-input corpus files
        counts = {k: int(trace.metrics.get(f"lossless_{k}")) for k in keys}
        if not any(counts.values()):
            continue  # no modular streams routed through the lanes
        for k in keys:
            totals[k] += counts[k]
        rows.append({"file": path.name, **counts})

    total_px = sum(totals.values()) or 1
    # identity pixels need no reconstruction at all, so they count toward
    # the device-eligible share (the round-3 done-criterion's numerator)
    eligible = totals["px_device"] + totals["px_identity"]
    print(f"{'file':42s} {'device':>10s} {'ident':>10s} {'host':>8s} {'inelig':>10s}")
    for r in rows:
        print(
            f"{r['file'][:42]:42s} {r['px_device']:10d} {r['px_identity']:10d}"
            f" {r['px_host']:8d} {r['px_ineligible']:10d}"
        )
    print(
        f"\nTOTAL modular px: {total_px}  device: {totals['px_device']}"
        f" ({100 * totals['px_device'] / total_px:.1f}%)"
        f"  identity: {totals['px_identity']}"
        f" ({100 * totals['px_identity'] / total_px:.1f}%)"
        f"  host-gate: {totals['px_host']}"
        f"  ineligible: {totals['px_ineligible']}"
        f" ({100 * totals['px_ineligible'] / total_px:.1f}%)"
    )
    print(f"device-eligible share: {100 * eligible / total_px:.1f}%")
    if args.json:
        pathlib.Path(args.json).write_text(
            json.dumps({"rows": rows, "totals": totals,
                        "eligible_share": eligible / total_px}, indent=1)
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
