"""Tests for the result-aggregation scripts (ref
examples/lossless/data_aggregation.py and the lossy visualization
notebook): heatmap grids from per-image CSVs, crash counting, RD curves."""

import csv
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_csv(path, rows, fields):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow(r)


def test_lossless_grid_aggregation(tmp_path):
    root = tmp_path / "grid"
    fields = ["total_bits_per_dim", "ideal_elbo_bpd", "comp_time"]
    # Two grid cells: one full (2 images), one short (1 image -> 1 crash).
    _write_csv(str(root / "omega_3.0_beams_20_extra_1.2" / "cifar10.csv"),
               [{"total_bits_per_dim": 4.5, "ideal_elbo_bpd": 4.0,
                 "comp_time": 1.5},
                {"total_bits_per_dim": 4.7, "ideal_elbo_bpd": 4.1,
                 "comp_time": 2.5}], fields)
    _write_csv(str(root / "omega_5.0_beams_10_extra_1.2" / "cifar10.csv"),
               [{"total_bits_per_dim": 5.0, "ideal_elbo_bpd": 4.0,
                 "comp_time": 3.0}], fields)
    out = tmp_path / "agg"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "lossless", "data_aggregation.py"),
         "--root", str(root), "--expected-images", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    overhead = np.load(out / "overhead_extra_1.2.npy")
    runtime = np.load(out / "runtime_extra_1.2.npy")
    crashes = np.load(out / "crashes_extra_1.2.npy")
    # rows = sorted omegas [3.0, 5.0], cols = sorted beams [10, 20]
    assert overhead.shape == (2, 2)
    np.testing.assert_allclose(overhead[0, 1], 0.55, atol=1e-6)
    np.testing.assert_allclose(overhead[1, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(runtime[0, 1], 2.0, atol=1e-6)
    assert crashes[0, 1] == 0 and crashes[1, 0] == 1
    assert np.isnan(overhead[0, 0]) and np.isnan(overhead[1, 1])


def test_lossy_rd_curves(tmp_path):
    root = tmp_path / "lossy"
    fields = ["bpp", "psnr", "ms_ssim"]
    for beta, bpp, psnr, ms in ((0.001, 0.2, 28.0, 0.92),
                                (0.01, 0.6, 32.0, 0.97)):
        _write_csv(str(root / f"beta_{beta}" / "kodak.csv"),
                   [{"bpp": bpp, "psnr": psnr, "ms_ssim": ms},
                    {"bpp": bpp + 0.1, "psnr": psnr + 1.0,
                     "ms_ssim": ms + 0.005}], fields)
    out = tmp_path / "rd"
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "lossy", "rd_curves.py"),
         "--root", str(root), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    curve = np.load(out / "rd_curve.npy")
    # One row per beta, sorted by mean bpp: (bpp, psnr, ms_ssim_db).
    assert curve.shape == (2, 3)
    assert curve[0, 0] < curve[1, 0]            # increasing rate
    assert curve[0, 1] < curve[1, 1]            # increasing PSNR
    # MS-SSIM reported in dB: -10 log10(1 - ms_ssim).
    expected_db = -10.0 * np.log10(1.0 - np.mean([0.92, 0.925]))
    np.testing.assert_allclose(curve[0, 2], expected_db, rtol=1e-5)
