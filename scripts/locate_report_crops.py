"""Locate the reference report's per-feature images inside its full renders.

The report's feature images (report/01-spheres.png ... 08-scatter.png,
report/Report.md:49-205) are small, irregular-size screenshots.  Hypothesis:
each is a crop (possibly of an intermediate/dev render) of one of the three
full-resolution renders shipped in report/ (out.png, out_single_epoch.png,
out_small_blur.png).  This tool finds, for each feature image, the
best-matching window in each full render via FFT normalized cross-correlation
and prints offset + PSNR of the crop against that window.

A high PSNR (>~25 dB raw) means the feature image IS a crop of that render,
so the per-feature fidelity of raytracer_tpu can be scored by cropping OUR
render of the same schedule at the same offset (scripts/psnr_vs_reference.py
--features).  A low best PSNR means the screenshot predates the final scene
constants and cannot be matched pixel-wise — recorded explicitly, not
skipped.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPORT = "/root/reference/report"
FULL = ["out.png", "out_single_epoch.png", "out_small_blur.png"]
FEATURES = [
    "01-spheres.png", "02-triangles.png", "03-recursive-reflection.png",
    "04-recursive-refraction-01.png", "04-recursive-refraction-02.png",
    "05-phong.png", "06-importing-obj.png", "07-texture-sphere.png",
    "07-texture-triangle.png", "08-dof-2.png", "08-dof.png",
    "08-dof-example.png", "08-scatter.png",
]


def _gray(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])


def locate(template: np.ndarray, image: np.ndarray):
    """Best (y, x) offset of template in image by normalized correlation.

    FFT cross-correlation of zero-mean grayscale signals, normalized by the
    local window energy (computed with summed-area tables).
    """
    t = _gray(template)
    im = _gray(image)
    th, tw = t.shape
    ih, iw = im.shape
    if th > ih or tw > iw:
        return None
    t0 = t - t.mean()
    fh, fw = ih + th - 1, iw + tw - 1
    F = np.fft.rfft2(im, (fh, fw))
    T = np.fft.rfft2(t0[::-1, ::-1], (fh, fw))
    corr = np.fft.irfft2(F * T, (fh, fw))[th - 1 : ih, tw - 1 : iw]
    # local window L2 energy via integral images
    ii = np.cumsum(np.cumsum(im * im, 0), 1)
    ii = np.pad(ii, ((1, 0), (1, 0)))
    s = np.cumsum(np.cumsum(im, 0), 1)
    s = np.pad(s, ((1, 0), (1, 0)))
    ny, nx = ih - th + 1, iw - tw + 1
    win2 = (ii[th : th + ny, tw : tw + nx] - ii[th : th + ny, :nx]
            - ii[:ny, tw : tw + nx] + ii[:ny, :nx])
    win1 = (s[th : th + ny, tw : tw + nx] - s[th : th + ny, :nx]
            - s[:ny, tw : tw + nx] + s[:ny, :nx])
    var = np.maximum(win2 - win1 * win1 / (th * tw), 1e-9)
    ncc = corr / np.sqrt(var * (t0 * t0).sum() + 1e-12)
    y, x = np.unravel_index(np.argmax(ncc), ncc.shape)
    return int(y), int(x), float(ncc[y, x])


def psnr_u8(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else float(20 * np.log10(255 / np.sqrt(mse)))


def read_rgb(path: str) -> np.ndarray:
    """Report feature images are RGBA screenshots; full renders are RGB8."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


SCALES = [round(1.0 + 0.25 * i, 2) for i in range(17)]  # 1.0 .. 5.0


def main() -> int:
    from PIL import Image

    fulls = {f: read_rgb(os.path.join(REPORT, f)) for f in FULL}
    out = {}
    for feat in FEATURES:
        tpl = read_rgb(os.path.join(REPORT, feat))
        best = None
        for name, img in fulls.items():
            ih, iw = img.shape[:2]
            for s in SCALES:
                # the feature screenshots are taken at viewer zoom 1/s of
                # the full render: downscale the render, then locate
                dw, dh = max(1, round(iw / s)), max(1, round(ih / s))
                if tpl.shape[0] > dh or tpl.shape[1] > dw:
                    continue
                small = np.asarray(
                    Image.fromarray(img).resize((dw, dh), Image.BOX)
                )
                loc = locate(tpl, small)
                if loc is None:
                    continue
                y, x, ncc = loc
                window = small[y : y + tpl.shape[0], x : x + tpl.shape[1]]
                p = psnr_u8(tpl, window)
                if best is None or p > best["psnr_db"]:
                    best = {"golden": name, "scale": s, "y": y, "x": x,
                            "ncc": round(ncc, 4), "psnr_db": round(p, 2),
                            "w": tpl.shape[1], "h": tpl.shape[0]}
        out[feat] = best
        print(feat, best, flush=True)
    path = os.path.join(REPO, "artifacts", "report_crops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
