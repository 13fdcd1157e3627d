"""Fidelity vs the reference's own golden render.

The reference's de-facto goldens are the PNGs under /root/reference/report/
(report/Report.md:19-45); the headline one is report/out.png — the full
schedule of src/main.rs:1084-1173 (1280x960, depth 5, Whitted pass + 100
stochastic epochs, percentile-renormalized each epoch).

This runner renders that exact schedule with raytracer_tpu and scores the
result against the golden:

  * raw PSNR in 8-bit sRGB space — saturated by MC noise (the golden is
    itself ONE noise realization of a 100-sample estimator), so it bounds
    from below;
  * noise-averaged PSNR: both images box-downsampled k x k (k=4, 8) before
    comparison, averaging the independent per-pixel MC noise away so the
    number measures structural/spectral agreement.

Usage:
  python scripts/psnr_vs_reference.py                    # render + score
  python scripts/psnr_vs_reference.py --use artifacts/out.png   # score only
  python scripts/psnr_vs_reference.py --epochs 20 --out /tmp/o.png

Scores are written to artifacts/PSNR.json (committed) so the regression
test (tests/test_reference_golden.py) can pin them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN = "/root/reference/report/out.png"


def psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR between two u8 RGB images (dB)."""
    assert a.shape == b.shape, (a.shape, b.shape)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def box_down(img: np.ndarray, k: int) -> np.ndarray:
    """k x k box average (float) — averages independent MC pixel noise."""
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    x = img[:h, :w].astype(np.float64)
    return x.reshape(h // k, k, w // k, k, 3).mean(axis=(1, 3))


def psnr_down(a: np.ndarray, b: np.ndarray, k: int) -> float:
    da, db = box_down(a, k), box_down(b, k)
    mse = np.mean((da - db) ** 2)
    return float(20.0 * np.log10(255.0 / np.sqrt(mse))) if mse else float("inf")


def score(render_path: str, golden_path: str = GOLDEN) -> dict:
    from raytracer_tpu.utils.png import read_png_rgb8

    got = read_png_rgb8(render_path)
    ref = read_png_rgb8(golden_path)
    return {
        "render": render_path,
        "golden": golden_path,
        "shape": list(got.shape),
        "psnr_raw_db": round(psnr_u8(got, ref), 2),
        "psnr_down4_db": round(psnr_down(got, ref, 4), 2),
        "psnr_down8_db": round(psnr_down(got, ref, 8), 2),
    }


def self_noise(render_a: str, render_b: str) -> dict:
    """MC noise floor: PSNR between two repo renders of the SAME schedule
    with different seeds.  The golden is itself one noise realization of a
    100-sample estimator, so psnr(repo, golden) cannot exceed
    psnr(repo_a, repo_b) plus a small margin; if self-PSNR is far above the
    vs-golden number at some scale, the residue is structural bias, not
    noise (VERDICT r2 weak #6)."""
    from raytracer_tpu.utils.png import read_png_rgb8

    a = read_png_rgb8(render_a)
    b = read_png_rgb8(render_b)
    return {
        "self_render_a": render_a,
        "self_render_b": render_b,
        "self_psnr_raw_db": round(psnr_u8(a, b), 2),
        "self_psnr_down4_db": round(psnr_down(a, b, 4), 2),
        "self_psnr_down8_db": round(psnr_down(a, b, 8), 2),
    }


def score_features(render_path: str, crops_json: str) -> dict:
    """Per-feature fidelity vs report/01-spheres.png ... 08-scatter.png.

    scripts/locate_report_crops.py established (artifacts/report_crops.json)
    that every report feature image except the hand-drawn 08-dof.png diagram
    is a crop of a box-downscaled report/out.png (NCC >= 0.986): so each
    feature golden is scored by downscaling OUR render of the same schedule
    by the same factor, cropping the same window, and comparing — raw and
    4x-noise-averaged.  Entries that are not crops of the final render are
    recorded with "match": false rather than skipped (VERDICT r2 item 7).
    """
    from PIL import Image

    from raytracer_tpu.utils.png import read_png_rgb8

    with open(crops_json) as f:
        crops = json.load(f)
    ours = read_png_rgb8(render_path)
    out = {}
    for feat, loc in sorted(crops.items()):
        if loc is None or loc["ncc"] < 0.9:
            out[feat] = {
                "match": False,
                "why": "not a crop of the final render (hand-drawn diagram "
                       "or pre-final scene state); best NCC "
                       f"{0 if loc is None else loc['ncc']}",
            }
            continue
        s = loc["scale"]
        golden = np.asarray(
            Image.open(os.path.join(os.path.dirname(GOLDEN), feat))
            .convert("RGB")
        )
        dw, dh = round(ours.shape[1] / s), round(ours.shape[0] / s)
        small = np.asarray(Image.fromarray(ours).resize((dw, dh), Image.BOX))
        win = small[loc["y"] : loc["y"] + loc["h"],
                    loc["x"] : loc["x"] + loc["w"]]
        out[feat] = {
            "match": True,
            "golden_is_crop_of": loc["golden"],
            "scale": s,
            "offset": [loc["y"], loc["x"]],
            "crop_vs_golden_psnr_db": loc["psnr_db"],  # golden self-check
            "psnr_raw_db": round(psnr_u8(win, golden), 2),
            "psnr_down4_db": round(psnr_down(win, golden, 4), 2),
        }
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--use", default=None, metavar="PNG",
                   help="score an existing render instead of rendering")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--out", default=os.path.join(REPO, "artifacts", "out.png"))
    p.add_argument("--golden", default=GOLDEN)
    p.add_argument("--json", default=os.path.join(REPO, "artifacts", "PSNR.json"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--self-b", default=None, metavar="PNG",
                   help="second same-schedule render (different seed): "
                        "record the MC self-noise floor next to the scores")
    args = p.parse_args(argv)

    if args.use is None:
        from raytracer_tpu.config import RenderConfig
        from raytracer_tpu.parallel.progressive import render_progressive
        from raytracer_tpu.scene.presets import demo_camera, demo_scene
        from raytracer_tpu.utils.cache import enable_compile_cache

        enable_compile_cache()
        scene, textures = demo_scene()
        cfg = RenderConfig(width=1280, height=960, depth=5, epochs=args.epochs)
        t0 = time.time()
        render_progressive(scene, textures, demo_camera(), cfg,
                           out_path=args.out, seed=args.seed)
        print(f"full schedule ({args.epochs} epochs): {time.time() - t0:.1f}s")
        render_path = args.out
    else:
        render_path = args.use

    result = score(render_path, args.golden)
    result["epochs"] = args.epochs if args.use is None else None
    if args.self_b:
        result.update(self_noise(render_path, args.self_b))
    crops_json = os.path.join(REPO, "artifacts", "report_crops.json")
    if os.path.exists(crops_json):
        result["features"] = score_features(render_path, crops_json)
    print(json.dumps(result, indent=2))
    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
