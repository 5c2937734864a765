#!/usr/bin/env python
"""Conformance runner: decode the whole reference corpus and emit a JSON
report + markdown summary table.

Capability reference: the reference's CI consumes per-test JSON from the
libjxl conformance runner and renders a markdown table
(ci/conformance_summary.py:11-42, merge_conformance_report.py). Here the
runner itself is included: per file it records decode success, frame
count/shape, wall time, and — where an independent golden exists
(splines.pfm) — PSNR against it.

Usage: python ci/run_conformance.py [--out report.json] [--markdown]
"""

import argparse
import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

CORPUS = pathlib.Path("/root/reference/jxl/resources/test")
EXPECT_FAIL = {"invalid_animated_ooo_jxlp.jxl"}


def read_pfm(path):
    import numpy as np

    with open(path, "rb") as f:
        hdr = f.readline().strip()
        dims = f.readline().split()
        scale = float(f.readline())
        w, h = int(dims[0]), int(dims[1])
        nc = 3 if hdr == b"PF" else 1
        data = np.frombuffer(f.read(), dtype="<f4" if scale < 0 else ">f4")
        return data.reshape(h, w, nc)[::-1]


def run_one(path: pathlib.Path) -> dict:
    import numpy as np

    from jxl_tpu.api.decoder import Event, JxlDecoder
    from jxl_tpu.errors import JxlError

    rec = {"file": str(path.relative_to(CORPUS))}
    t0 = time.perf_counter()
    try:
        d = JxlDecoder()
        d.feed(path.read_bytes())
        d.end_input()
        while d.process() is not Event.COMPLETE:
            pass
        rec["success"] = True
        rec["frames"] = len(d.frames)
        rec["shape"] = list(d.frames[0].shape) if d.frames else None
        rec["finite"] = bool(all(np.isfinite(f).all() for f in d.frames))
    except JxlError as e:
        rec["success"] = False
        rec["error"] = f"{type(e).__name__}: {e}"
    except Exception as e:  # pragma: no cover - hard failure
        rec["success"] = False
        rec["error"] = f"CRASH {type(e).__name__}: {e}"
        rec["trace"] = traceback.format_exc()[-1000:]
    rec["seconds"] = round(time.perf_counter() - t0, 3)

    golden = path.with_suffix(".pfm")
    if rec.get("success") and golden.exists():
        from jxl_tpu.api.simple import decode_first_frame
        from jxl_tpu.render.simple import render_frame

        g = read_pfm(golden)
        df = decode_first_frame(path.read_bytes())
        out = render_frame(df.frame)
        if out.shape == g.shape:
            mse = float(np.mean((out - g) ** 2))
            rec["golden_psnr_db"] = round(
                -10 * np.log10(mse) if mse > 0 else 999.0, 2
            )
    if path.name in EXPECT_FAIL:
        rec["expected_failure"] = True
        rec["raw_success"] = rec["success"]
        # pass = rejected with a *typed* error (ref expects Error::InvalidBox,
        # not an arbitrary crash)
        rec["success"] = (not rec["raw_success"]) and not rec.get(
            "error", ""
        ).startswith("CRASH")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="conformance_report.json")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--files", nargs="*", help="subset of corpus files")
    args = ap.parse_args()

    files = (
        [CORPUS / f for f in args.files]
        if args.files
        else sorted(CORPUS.glob("*.jxl"))
        + sorted((CORPUS / "conformance_test_images").glob("*.jxl"))
    )
    records = []
    for f in files:
        rec = run_one(f)
        records.append(rec)
        status = "PASS" if rec["success"] else "FAIL"
        print(f"{status} {rec['file']} ({rec['seconds']}s)", flush=True)

    passed = sum(r["success"] for r in records)
    report = {
        "total": len(records),
        "passed": passed,
        "failed": len(records) - passed,
        "results": records,
    }
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    print(f"\n{passed}/{len(records)} passed -> {args.out}")

    if args.markdown:
        lines = [
            "| file | status | frames | time (s) | note |",
            "|---|---|---|---|---|",
        ]
        for r in records:
            note = r.get("error", "")
            if "golden_psnr_db" in r:
                note = f"golden PSNR {r['golden_psnr_db']} dB"
            if r.get("expected_failure"):
                note = "expected failure"
            lines.append(
                f"| {r['file']} | {'✅' if r['success'] else '❌'} |"
                f" {r.get('frames', '-')} | {r['seconds']} | {note} |"
            )
        md = pathlib.Path(args.out).with_suffix(".md")
        md.write_text("\n".join(lines))
        print(f"markdown -> {md}")


if __name__ == "__main__":
    main()
