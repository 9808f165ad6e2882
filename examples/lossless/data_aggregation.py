"""Result aggregation over (Omega, B, extra_samples) grids
(parity: ref examples/lossless/data_aggregation.py).

Reads the per-image CSVs produced by compression_performance.py from
``results/lossless/grid/omega_{o}_beams_{b}_extra_{e}/<dataset>.csv`` and
emits heatmaps of coding overhead (actual vs ideal bpd), encode runtime, and
crash counts (missing/short CSVs count as crashes, ref :24-38).

Usage: python examples/lossless/data_aggregation.py --root results/lossless/grid
"""

import argparse
import csv
import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="results/lossless/grid")
    ap.add_argument("--expected-images", type=int, default=10)
    ap.add_argument("--out", default="results/lossless/aggregated")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    pattern = re.compile(r"omega_([\d.]+)_beams_(\d+)_extra_([\d.]+)")
    cells = {}
    for d in sorted(glob.glob(os.path.join(args.root, "omega_*"))):
        m = pattern.search(os.path.basename(d))
        if not m:
            continue
        omega, beams, extra = (float(m.group(1)), int(m.group(2)),
                               float(m.group(3)))
        csvs = glob.glob(os.path.join(d, "*.csv"))
        rows = []
        for c in csvs:
            with open(c) as f:
                rows.extend(list(csv.DictReader(f)))
        crashes = max(0, args.expected_images - len(rows))
        overhead = [float(r["total_bits_per_dim"]) - float(r["ideal_elbo_bpd"])
                    for r in rows] or [np.nan]
        runtime = [float(r["comp_time"]) for r in rows] or [np.nan]
        cells[(omega, beams, extra)] = dict(
            overhead=float(np.nanmean(overhead)),
            runtime=float(np.nanmean(runtime)),
            crashes=crashes)

    if not cells:
        print(f"no grid results under {args.root}")
        return

    omegas = sorted({k[0] for k in cells})
    beams = sorted({k[1] for k in cells})
    extras = sorted({k[2] for k in cells})
    for metric in ("overhead", "runtime", "crashes"):
        for e in extras:
            grid = np.full((len(omegas), len(beams)), np.nan)
            for (o, b, ee), v in cells.items():
                if ee == e:
                    grid[omegas.index(o), beams.index(b)] = v[metric]
            np.save(os.path.join(args.out, f"{metric}_extra_{e}.npy"), grid)
            print(f"{metric} (extra={e}), rows=omega {omegas}, "
                  f"cols=beams {beams}:")
            print(np.array2string(grid, precision=3))
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.figure()
                plt.imshow(grid, aspect="auto")
                plt.colorbar()
                plt.xticks(range(len(beams)), beams)
                plt.yticks(range(len(omegas)), omegas)
                plt.xlabel("n_beams"), plt.ylabel("omega")
                plt.title(f"{metric} (extra={e})")
                plt.savefig(os.path.join(args.out,
                                         f"{metric}_extra_{e}.png"), dpi=120)
                plt.close()
            except Exception:
                pass


if __name__ == "__main__":
    main()
