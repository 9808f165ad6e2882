"""Rate-distortion curve aggregation for the lossy models
(parity: ref "Lossy Compression Performance Visualization.ipynb" and the
published RD plots, ref plots/lossy_compression/*.png, README.md:117-118).

Reads the per-image CSVs produced by compress_with_lossy_model.py from
``<root>/beta_{b}/<dataset>.csv``, averages each beta's operating point, and
emits the PSNR-vs-bpp and MS-SSIM(dB)-vs-bpp curves as ``rd_curve.npy``
(rows sorted by bpp: [bpp, psnr, ms_ssim_db]) plus matplotlib plots when
available.

Usage: python examples/lossy/rd_curves.py --root results/lossy --out results/rd
"""

import argparse
import csv
import glob
import os
import re

import numpy as np


def _ms_ssim_db(v):
    return -10.0 * np.log10(np.maximum(1.0 - v, 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="results/lossy")
    ap.add_argument("--out", default="results/lossy/rd")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    pattern = re.compile(r"beta_([\d.eE+-]+)")
    points = []
    for d in sorted(glob.glob(os.path.join(args.root, "beta_*"))):
        m = pattern.search(os.path.basename(d))
        if not m:
            continue
        rows = []
        for c in glob.glob(os.path.join(d, "*.csv")):
            with open(c) as f:
                rows.extend(list(csv.DictReader(f)))
        if not rows:
            continue
        # compress_with_lossy_model.py writes "actual_bpp" (file bits) and
        # "ideal_bpp" (KL); accept either column name for robustness.
        bpp = float(np.mean([float(r.get("actual_bpp", r.get("bpp")))
                             for r in rows]))
        psnr = float(np.mean([float(r["psnr"]) for r in rows]))
        ms = float(np.mean([float(r["ms_ssim"]) for r in rows]))
        points.append((bpp, psnr, float(_ms_ssim_db(ms))))

    if not points:
        print(f"no lossy results under {args.root}")
        return
    curve = np.asarray(sorted(points), np.float64)
    np.save(os.path.join(args.out, "rd_curve.npy"), curve)
    print("bpp      psnr     ms-ssim(dB)")
    for bpp, psnr, msdb in curve:
        print(f"{bpp:7.4f} {psnr:8.3f} {msdb:11.3f}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for col, name in ((1, "psnr"), (2, "ms_ssim_db")):
            plt.figure()
            plt.plot(curve[:, 0], curve[:, col], marker="o")
            plt.xlabel("bits per pixel")
            plt.ylabel(name)
            plt.grid(True, alpha=0.3)
            plt.savefig(os.path.join(args.out, f"rd_{name}.png"), dpi=120)
            plt.close()
    except Exception:
        pass


if __name__ == "__main__":
    main()
