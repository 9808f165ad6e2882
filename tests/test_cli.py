"""Subprocess smoke tests of the example CLIs (the reference's workflows are
driven by scripts, SURVEY.md §2.5; these pin the entry points so 'CLI drive'
coverage claims stay reproducible).  Tiny settings, CPU platform."""

import os
import subprocess
import sys

import pytest

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
