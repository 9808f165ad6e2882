"""Subprocess smoke tests of the example CLIs (the reference's workflows are
driven by scripts, SURVEY.md §2.5; these pin the entry points so 'CLI drive'
coverage claims stay reproducible).  Tiny settings, CPU platform."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")


def _run(args, timeout=300):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, timeout=timeout, env=ENV, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout + r.stderr


@pytest.mark.parametrize("prior", ["gaussian", "mog", "vamp", "snis"])
def test_mnist_emp_bayes_priors(prior, tmp_path):
    out = _run([os.path.join(REPO, "examples", "mnist_emp_bayes.py"),
                "--prior", prior, "--iters", "3", "--batch", "8",
                "--latents", "8", "--hidden", "16",
                "--save-dir", str(tmp_path)])
    assert "done:" in out and "nan steps=0" in out


def test_astar_sampling_demo():
    out = _run([os.path.join(REPO, "examples", "astar_sampling_demo.py"),
                "--samples", "60", "--seed", "1"])
    assert "mean within 4 standard errors: True" in out


def test_serve_data_parallel(tmp_path):
    """Batched serving CLI on an 8-device virtual mesh: sharded vmapped
    compress, .rec write (rANS codec), batched decode verify."""
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "lossless",
                                      "serve.py"),
         "model_cfg.num_res_blocks=3", "model_cfg.deterministic_filters=16",
         "model_cfg.stochastic_filters=4", "n_beams=3", "extra_samples=1.0",
         "block_size=128", "max_partitions=6", "batch_size=8",
         "num_images=10", "codec=rans", f"output_dir={tmp_path}"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "served 10 images" in r.stdout
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".rec")]) == 10


def test_lossy_serve_data_parallel(tmp_path):
    """Batched LOSSY serving CLI (examples/lossy/serve.py): sharded vmapped
    rec_forward, per-image .rec writes, per-file index round trip + decode
    coherence verification."""
    env = dict(ENV, XLA_FLAGS="--xla_force_host_platform_device_count=8")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "lossy", "serve.py"),
         "model=large_level_2_vae", "level_1_filters=8",
         "level_2_filters=8", "n_beams=3", "extra_samples=1.0",
         "block_size=128", "max_partitions=8", "batch_size=8",
         "num_images=10", "pad_multiple=64", "dataset.dataset=clic2019",
         f"output_dir={tmp_path}"],
        capture_output=True, text=True, timeout=480, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "served 10 lossy images" in r.stdout
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".rec")]) == 10
