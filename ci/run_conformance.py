#!/usr/bin/env python
"""Conformance runner: decode the whole reference corpus and emit a JSON
report + markdown summary table.

Capability reference: the reference's CI consumes per-test JSON from the
libjxl conformance runner and renders a markdown table
(ci/conformance_summary.py:11-42, merge_conformance_report.py). Here the
runner itself is included. Per file it records:

- decode success, frame count/shape, wall time, finite-pixel check
- a sha256 content hash of each frame's u8 quantization (regression pin)
- independent pixel verification where reference-recorded data exists:
  * the splines.pfm golden (PSNR)
  * the reference's progressive MSE checkpoint tables (36 files,
    jxl/src/tests/mod.rs) — flush quality at recorded byte positions
    must meet the reference's own thresholds
  * device-vs-host AC decode equality for eligible VarDCT files

The summary separates "decoded" (no crash, finite pixels) from
"verified" (at least one independent pixel-level check passed).

Usage: python ci/run_conformance.py [--out report.json] [--markdown]
       [--no-verify] [--files a.jxl b.jxl]
"""

import argparse
import hashlib
import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

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


def _frame_hash(frame) -> str:
    import numpy as np

    q = np.clip(frame * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return hashlib.sha256(q.tobytes()).hexdigest()[:16]


def _check_progressive(path, data, final, rec):
    """Flush-quality gates from the reference's recorded tables."""
    import numpy as np

    from progressive_tables import CHECKPOINT_TABLES
    from jxl_tpu.api.decoder import Event, JxlDecoder

    rel = str(path.relative_to(CORPUS))
    table = CHECKPOINT_TABLES.get(rel)
    if table is None:
        return
    # Files gated against libjxl's own flush instead of the jxl-rs table
    # (the table describes jxl-rs's flush in ITS output space, which for
    # these streams differs from the conformance output space both we and
    # libjxl flush in). The full per-byte derivation is recorded below as
    # progressive_gate_derivation so the deviation is auditable.
    from test_progressive import _LIBJXL_GATED

    libjxl_gate = rel in _LIBJXL_GATED
    lib_final = None
    if libjxl_gate:
        try:
            from libjxl_ref import available, decode_partial, decode_ref

            if available():
                refs, _info = decode_ref(data, prefer_srgb=True)
                lib_final = refs[-1]
        except Exception:
            lib_final = None
    d = JxlDecoder()
    pos = 0
    worst = 0.0
    ok = True
    derivation = []
    for byte, thr in table:
        d.feed(data[pos:byte])
        pos = byte
        ev = d.process()
        while ev not in (Event.NEED_MORE_INPUT, Event.COMPLETE):
            ev = d.process()
        fl = d.flush_pixels()
        if fl is None:
            fl = np.zeros_like(final)
        nc = min(fl.shape[-1], final.shape[-1])
        fl, final_c = fl[..., :nc], final[..., :nc]
        mse = float(np.mean((fl - final_c) ** 2))
        if lib_final is not None:
            lib_fl = decode_partial(data, byte, num_channels=lib_final.shape[-1])
            lib_mse = float(np.mean((lib_fl - lib_final) ** 2))
            derivation.append(
                {
                    "byte": byte,
                    "our_mse": round(mse, 7),
                    "libjxl_mse": round(lib_mse, 7),
                    "jxlrs_table_mse": thr,
                    "ours_vs_table": round(mse / thr, 3) if thr > 0 else None,
                    "libjxl_vs_table": (
                        round(lib_mse / thr, 3) if thr > 0 else None
                    ),
                }
            )
            ratio = (mse / (lib_mse * 1.05 + 1e-6)) if lib_mse >= 0 else 99.0
            worst = max(worst, ratio)
            if mse > lib_mse * 1.05 + 1e-6:
                ok = False
            continue
        ratio = mse / thr if thr > 0 else (0.0 if mse <= 1e-6 else 99.0)
        worst = max(worst, ratio)
        if mse > thr * 1.02 + 1e-6:
            ok = False
    rec["progressive_checkpoints"] = {
        "count": len(table),
        "pass": ok,
        "worst_ratio": round(worst, 3),
        "gate": "libjxl_flush" if lib_final is not None else "jxlrs_table",
    }
    if lib_final is not None:
        rec["progressive_checkpoints"]["progressive_gate_derivation"] = {
            "why": (
                "jxl-rs's recorded thresholds describe its flush in its own "
                "output space; this stream's conformance output space "
                "differs, and libjxl's flush at the same bytes lands at the "
                "same MSE we do. Gate: our flush must match or beat "
                "libjxl's (x1.05)."
            ),
            "our_space": "conformance output (prefer_srgb f32)",
            "libjxl_space": "conformance output (prefer_srgb f32)",
            "checkpoints": derivation,
        }
    if ok:
        rec.setdefault("verified_by", []).append(
            "progressive_vs_libjxl_flush" if lib_final is not None
            else "progressive_mse_table"
        )


def _check_device_ac(path, data, rec):
    """Device-lane AC decode must match the native host path bit-exactly."""
    import os

    import numpy as np

    from jxl_tpu.api.simple import decode_image

    from jxl_tpu.vardct.device_group import STATS

    old = os.environ.get("JXL_TPU_AC")
    before = STATS["device_ac_frames"]
    try:
        os.environ["JXL_TPU_AC"] = "device"
        dev = decode_image(data, pixel_format="f32")
        os.environ["JXL_TPU_AC"] = "host"
        host = decode_image(data, pixel_format="f32")
    except Exception:
        return
    finally:
        if old is None:
            os.environ.pop("JXL_TPU_AC", None)
        else:
            os.environ["JXL_TPU_AC"] = old
    if STATS["device_ac_frames"] == before:
        return  # file never exercised the device AC path; equality is vacuous
    if len(dev.frames) == len(host.frames) and all(
        np.array_equal(a, b) for a, b in zip(dev.frames, host.frames)
    ):
        rec.setdefault("verified_by", []).append("device_host_ac_equality")


def _check_libjxl(path, data, frames, meta, rec):
    """Ground truth: compare every frame against the system libjxl
    (C reference implementation) in our output space — sRGB-forced for
    ICC-described XYB images, native otherwise. libjxl clamps negative
    linear values to 0 (we, like jxl-rs, keep them), so both sides are
    clamped before comparison."""
    import numpy as np

    from libjxl_ref import available, decode_ref
    from jxl_tpu.io.headers import ExtraChannel

    if not available():
        return
    want_srgb = meta.color_encoding.want_icc and meta.xyb_encoded
    refs, info = decode_ref(data, prefer_srgb=want_srgb)
    if len(refs) != len(frames):
        rec["libjxl_mse"] = f"frame count {len(frames)} vs {len(refs)}"
        return
    alpha_idx = next(
        (
            i
            for i, e in enumerate(meta.extra_channel_info)
            if e.ec_type == ExtraChannel.ALPHA
        ),
        None,
    )
    worst = 0.0
    for ours, ref in zip(frames, refs):
        if info.num_color_channels == 1:
            pairs = [(0, 0)]
            if ref.shape[-1] > 1 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 1))
        else:
            pairs = [(c, c) for c in range(min(3, ref.shape[-1]))]
            if ref.shape[-1] > 3 and alpha_idx is not None:
                pairs.append((3 + alpha_idx, 3))
        if ours.shape[:2] != ref.shape[:2]:
            rec["libjxl_mse"] = f"shape {ours.shape} vs {ref.shape}"
            return
        for oc, rc in pairs:
            a = np.maximum(ours[..., oc].astype(np.float32), 0.0)
            b = np.maximum(ref[..., rc], 0.0)
            worst = max(worst, float(((a - b) ** 2).mean()))
    rec["libjxl_mse"] = worst
    if worst < 1e-6:
        rec.setdefault("verified_by", []).append("libjxl_groundtruth")


def run_one(path: pathlib.Path, verify: bool) -> dict:
    import numpy as np

    from jxl_tpu.api.decoder import Event, JxlDecoder
    from jxl_tpu.errors import JxlError

    rec = {"file": str(path.relative_to(CORPUS))}
    data = path.read_bytes()
    t0 = time.perf_counter()
    final_frames = None
    try:
        d = JxlDecoder()
        d.feed(data)
        d.end_input()
        while d.process() is not Event.COMPLETE:
            pass
        rec["success"] = True
        rec["frames"] = len(d.frames)
        rec["shape"] = list(d.frames[0].shape) if d.frames else None
        rec["finite"] = bool(all(np.isfinite(f).all() for f in d.frames))
        rec["frame_hashes"] = [_frame_hash(f) for f in d.frames[:8]]
        final_frames = d.frames
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
        df = decode_first_frame(data)
        out = render_frame(df.frame)
        if out.shape == g.shape:
            mse = float(np.mean((out - g) ** 2))
            rec["golden_psnr_db"] = round(
                -10 * np.log10(mse) if mse > 0 else 999.0, 2
            )
            if rec["golden_psnr_db"] > 60:
                rec.setdefault("verified_by", []).append("pfm_golden")

    if verify and rec.get("success") and final_frames:
        try:
            _check_libjxl(
                path, data, final_frames, d.file_header.image_metadata, rec
            )
        except Exception as e:
            rec["libjxl_mse"] = f"error: {str(e)[:120]}"
        try:
            _check_progressive(path, data, final_frames[0], rec)
        except Exception as e:
            rec["progressive_checkpoints"] = {"error": str(e)[:120]}
        try:
            _check_device_ac(path, data, rec)
        except Exception:
            pass

    if path.name in EXPECT_FAIL:
        rec["expected_failure"] = True
        rec["raw_success"] = rec["success"]
        # pass = rejected with a *typed* error (ref expects Error::InvalidBox,
        # not an arbitrary crash)
        rec["success"] = (not rec["raw_success"]) and not rec.get(
            "error", ""
        ).startswith("CRASH")
        if rec["success"]:
            rec.setdefault("verified_by", []).append("typed_rejection")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="conformance_report.json")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--no-verify", action="store_true")
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
        rec = run_one(f, verify=not args.no_verify)
        records.append(rec)
        status = "PASS" if rec["success"] else "FAIL"
        ver = ",".join(rec.get("verified_by", [])) or "-"
        print(f"{status} {rec['file']} ({rec['seconds']}s) verified: {ver}", flush=True)

    passed = sum(r["success"] for r in records)
    verified = sum(bool(r.get("verified_by")) for r in records)
    report = {
        "total": len(records),
        "passed": passed,
        "failed": len(records) - passed,
        "pixel_verified": verified,
        "note": (
            "'passed' = decoded without error, finite pixels; "
            "'pixel_verified' = at least one independent pixel-level check "
            "(pfm golden / reference MSE table / device-host equality) passed"
        ),
        "results": records,
    }
    pathlib.Path(args.out).write_text(json.dumps(report, indent=1))
    print(
        f"\n{passed}/{len(records)} decoded, {verified}/{len(records)}"
        f" pixel-verified -> {args.out}"
    )

    if args.markdown:
        lines = [
            "| file | status | frames | time (s) | verified by | note |",
            "|---|---|---|---|---|---|",
        ]
        for r in records:
            note = r.get("error", "")
            if "golden_psnr_db" in r:
                note = f"golden PSNR {r['golden_psnr_db']} dB"
            pc = r.get("progressive_checkpoints")
            if pc and "worst_ratio" in pc:
                note += f" ckpt worst {pc['worst_ratio']}x"
            if r.get("expected_failure"):
                note = "expected failure"
            ver = ", ".join(r.get("verified_by", [])) or "—"
            lines.append(
                f"| {r['file']} | {'✅' if r['success'] else '❌'} |"
                f" {r.get('frames', '-')} | {r['seconds']} | {ver} | {note} |"
            )
        md = pathlib.Path(args.out).with_suffix(".md")
        md.write_text("\n".join(lines))
        print(f"markdown -> {md}")


if __name__ == "__main__":
    main()
