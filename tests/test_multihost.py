"""Multi-host data-parallel serving (SURVEY.md §2.9/§5.8).

Two REAL processes with distinct JAX process ids coordinate through
``jax.distributed.initialize`` on localhost (CPU backend, 2 virtual devices
each = a 4-device global mesh): the global batch shards over all devices,
each process writes the .rec files for its shard (host-local writes), and
every file is verified in-process (container round trip + canonical decode +
exact pixel recovery).  A follow-up single-process decode of ALL files
checks cross-host coherence: a file written by either host decodes anywhere.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SERVE = os.path.join(REPO, "examples", "lossless", "serve.py")

TINY = ["model_cfg.num_res_blocks=2", "model_cfg.deterministic_filters=8",
        "model_cfg.stochastic_filters=4", "n_beams=3", "extra_samples=1.0",
        "block_size=64", "max_partitions=6", "batch_size=4", "num_images=6",
        "codec=rans", "dataset.synthetic_size=8"]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("n_proc", [2, 4])
def test_multi_process_serve(tmp_path, n_proc):
    port = _free_port()
    # model_save_dir points at an empty dir so both serve and the decode
    # check below build identical fresh-initialized params.
    args = TINY + [f"output_dir={tmp_path}",
                   f"model_save_dir={tmp_path}/ckpt",
                   f"coordinator=localhost:{port}",
                   f"num_processes={n_proc}"]
    dev_per_proc = 2 if n_proc == 2 else 1
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{dev_per_proc}")
    procs = [subprocess.Popen(
        [sys.executable, SERVE] + args + [f"process_id={i}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(n_proc)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    # All 6 images written exactly once across the hosts.
    recs = sorted(f for f in os.listdir(tmp_path) if f.endswith(".rec"))
    assert recs == [f"img_{i}.rec" for i in range(6)], recs
    # Each process wrote a nonempty, non-overlapping share.
    counts = [int(out.split("served ")[1].split(" images")[0])
              for out in outs]
    assert sum(counts) == 6 and all(c > 0 for c in counts), counts
    # In-process verification ran on every file.
    assert all("verified" in out for out in outs)

    # Cross-host coherence: ONE process decodes every file, regardless of
    # which host wrote it, and recovers exact pixels.
    check = subprocess.run(
        [sys.executable, "-c", f"""
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from rec_tpu.coding import BeamSearchCoder
from rec_tpu.data.datasets import DatasetConfig, load_images, normalize
from rec_tpu.io import read_rec
from rec_tpu.io.residual import decode_residual, quantize
from rec_tpu.models.resnet_vae import BidirectionalResNetVAE, ResNetVAEConfig

cfg = ResNetVAEConfig(num_res_blocks=2, deterministic_filters=8,
                      stochastic_filters=4)
coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=3, extra_samples=1.0,
                        block_size=64, max_partitions=6)
model = BidirectionalResNetVAE(cfg=cfg, coder=coder)
images, _ = load_images(DatasetConfig(dataset="cifar10", split="test",
                                      synthetic_size=8))
images = normalize(images, "centered")[:6]
params = model.init(jax.random.PRNGKey(42), jnp.asarray(images[:1]),
                    jax.random.PRNGKey(43))
dec = jax.jit(lambda p, i, c, s: model.apply(p, (32, 32), i, c, s,
                                             method=model.decompress))
scale = float(jnp.exp(params["params"]["likelihood_log_scale"]))
for i in range(6):
    seed, shape, _, lat, res = read_rec(
        {str(tmp_path)!r} + f"/img_{{i}}.rec", max_partitions=6,
        with_residual=True)
    ind = jnp.stack([jnp.asarray(a) for a, _ in lat])
    cnt = jnp.stack([jnp.asarray(c) for _, c in lat])
    recon = np.asarray(dec(params, ind, cnt, seed))[0]
    out01 = decode_residual(res, recon, scale)
    assert np.array_equal(quantize(out01), quantize(images[i] + 0.5)), i
print("cross-host decode OK")
"""],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert check.returncode == 0, check.stdout + check.stderr
    assert "cross-host decode OK" in check.stdout
