"""Multi-device / multi-process scaling measurement (BASELINE.md north star:
>= 0.9 encode-throughput scaling efficiency).

Real multi-chip hardware is not available in this environment (one TPU chip
behind a tunnel; the CPU host has 2 cores shared by all virtual devices),
so compute-scaling cannot be measured directly — 8 virtual CPU devices
time-slice the same 2 cores.  What CAN be measured honestly, and what this
harness reports:

1. **Process-boundary overhead at fixed compute** (``mode=serve``): the
   same global image set encoded by (a) ONE process with a 2-device mesh
   vs (b) TWO coordinated processes (jax.distributed) with 1 device each.
   Both saturate the same 2 cores, so ideal scaling = equal TOTAL
   throughput; the ratio isolates the multi-host runtime's coordination
   cost (the only non-structural term in multi-chip scaling — encode has
   zero cross-image communication).

2. **Collective-free proof** (``mode=hlo``): compile the sharded batch
   compress and the sharded block codec for an 8-device mesh and COUNT
   collective ops crossing the data axis in the optimized HLO.  Zero
   collectives + flat per-image batched cost on the real chip (PERF.md)
   means throughput scales with chips up to input distribution, which is
   the structural basis for the >= 0.9 efficiency target.

3. **Sharded-codec dispatch overhead** (``mode=codec``): the same block
   set encoded on a 1-device vs 8-device mesh (CPU).  Times are NOT a
   chip-scaling measurement (shared cores); the reported number is the
   sharding overhead ratio (8-dev wall / 1-dev wall), ideal = 1.0 on
   shared cores.

Usage:
    python examples/lossless/scaling_bench.py mode=serve|hlo|codec|all
Writes results/scaling/scaling.json and prints one JSON line per mode.
"""

from __future__ import annotations

import json
import os
import re
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

SERVE = os.path.join(REPO, "examples", "lossless", "serve.py")

TINY = ["model_cfg.num_res_blocks=4", "model_cfg.deterministic_filters=16",
        "model_cfg.stochastic_filters=8", "n_beams=8", "extra_samples=1.2",
        "block_size=250", "max_partitions=12", "batch_size=8",
        "num_images=32", "codec=rans", "dataset.synthetic_size=32",
        "verify=false", "true_lossless=false"]


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_serve(num_processes: int, devices_per_process: int, out_dir: str):
    """Launch the serve CLI as real coordinated processes on CPU; returns
    (total_images, total_throughput) summed over processes."""
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count="
                         f"{devices_per_process}")
    args = TINY + [f"output_dir={out_dir}", f"model_save_dir={out_dir}/ckpt"]
    if num_processes > 1:
        port = _free_port()
        args += [f"coordinator=localhost:{port}",
                 f"num_processes={num_processes}"]
        procs = [subprocess.Popen(
            [sys.executable, SERVE] + args + [f"process_id={i}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO) for i in range(num_processes)]
        outs = [p.communicate(timeout=900)[0] for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-2000:]
    else:
        p = subprocess.run([sys.executable, SERVE] + args,
                           stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                           text=True, env=env, cwd=REPO, timeout=900)
        assert p.returncode == 0, p.stdout[-2000:]
        outs = [p.stdout]

    total_images, total_tput = 0, 0.0
    for out in outs:
        m = re.search(r"served (\d+) images at ([\d.]+) images/sec", out)
        assert m, out[-2000:]
        total_images += int(m.group(1))
        total_tput += float(m.group(2))
    return total_images, total_tput


def mode_serve(results):
    """1 process x 2 devices vs 2 processes x 1 device: same cores, same
    work — the ratio is the multi-process runtime's coordination cost."""
    os.makedirs("results/scaling", exist_ok=True)
    n1, t1 = _run_serve(1, 2, "results/scaling/serve_1p")
    n2, t2 = _run_serve(2, 1, "results/scaling/serve_2p")
    eff = t2 / t1 if t1 else float("nan")
    results["serve_process_scaling"] = {
        "one_process_2dev_images_per_sec": round(t1, 3),
        "two_process_1dev_each_images_per_sec": round(t2, 3),
        "images": [n1, n2],
        "efficiency_vs_single_process": round(eff, 3),
        "note": "2 host cores shared by all configs: ideal = 1.0; this "
                "isolates jax.distributed + per-shard-write overhead, the "
                "only non-structural term in multi-chip encode scaling "
                "(zero cross-image collectives, see hlo mode)",
    }
    print(json.dumps({"metric": "multi-process serve efficiency (2 proc vs "
                                "1, fixed 2 cores)", "value": round(eff, 3),
                      "unit": "ratio", "vs_baseline": round(eff / 0.9, 3)}))


def mode_hlo(results):
    """Compile the sharded programs for an 8-device mesh and count
    collectives in the optimized HLO."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rec_tpu.coding import BeamSearchCoder, GaussianParams
    from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                           ResNetVAEConfig)
    from rec_tpu.parallel import make_batch_compress, make_mesh
    from rec_tpu.parallel.mesh import data_axis_sharding

    mesh = make_mesh(8)
    cfg = ResNetVAEConfig(num_res_blocks=2, deterministic_filters=8,
                          stochastic_filters=4)
    coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=3,
                            extra_samples=1.0, block_size=64,
                            max_partitions=6, use_fused_kernel=False)
    model = BidirectionalResNetVAE(cfg=cfg, coder=coder)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 16, 16, 3) - 0.5,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], jax.random.PRNGKey(1))
    comp = make_batch_compress(model)
    xs = jax.device_put(x, data_axis_sharding(mesh, 4))
    sds = jax.device_put(jnp.arange(8), data_axis_sharding(mesh, 1))
    lowered = comp.lower(params, xs, sds)
    hlo = lowered.compile().as_text()

    patterns = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
    counts = {p: len(re.findall(p, hlo)) for p in patterns}
    total = sum(counts.values())
    results["hlo_collectives"] = {
        "program": "sharded batch compress (8-device mesh, batch axis)",
        "collective_op_counts": counts,
        "total": total,
        "note": "0 collectives = images never communicate; multi-chip "
                "encode throughput is structurally linear up to input "
                "distribution",
    }
    print(json.dumps({"metric": "collectives in sharded batch-compress HLO "
                                "(8-device mesh)", "value": total,
                      "unit": "ops", "vs_baseline": 0.0}))


def mode_codec(results):
    """Sharded block-codec wall time on a 1- vs 8-device mesh (shared
    cores: reports sharding overhead, not chip scaling)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rec_tpu.coding import BeamSearchCoder, GaussianParams
    from rec_tpu.parallel import sharded_encode_blocks
    from rec_tpu.parallel.mesh import make_mesh

    coder = BeamSearchCoder(kl_per_partition=3.0, n_beams=4,
                            extra_samples=1.2, block_size=256,
                            max_partitions=8, use_fused_kernel=False)
    rs = np.random.RandomState(0)
    shape = (64, 256)  # 64 blocks
    t = GaussianParams(jnp.asarray(0.4 * rs.randn(*shape), jnp.float32),
                       jnp.asarray(np.exp(0.1 * rs.randn(*shape)),
                                   jnp.float32))
    c = GaussianParams(jnp.zeros(shape, jnp.float32),
                       jnp.ones(shape, jnp.float32))

    times = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        ind, cnt, smp = sharded_encode_blocks(coder, t, c, 7, mesh)
        jax.block_until_ready(smp)  # compile (block_until_ready is fine on CPU)
        reps = 5
        t0 = time.perf_counter()
        for r in range(reps):
            ind, cnt, smp = sharded_encode_blocks(coder, t, c, 7 + r, mesh)
            jax.block_until_ready(smp)
        times[n_dev] = (time.perf_counter() - t0) / reps
    overhead = times[8] / times[1]
    results["sharded_codec_overhead"] = {
        "one_device_ms": round(1000 * times[1], 1),
        "eight_device_ms": round(1000 * times[8], 1),
        "overhead_ratio_8dev_vs_1dev": round(overhead, 3),
        "note": "8 virtual devices share 2 host cores; ideal ratio 1.0 — "
                "measures partitioning/dispatch overhead only",
    }
    print(json.dumps({"metric": "sharded codec 8-dev/1-dev wall ratio "
                                "(2 shared cores, ideal 1.0)",
                      "value": round(overhead, 3), "unit": "ratio",
                      "vs_baseline": round(1.0 / overhead, 3)}))


def main(argv):
    mode = "all"
    for a in argv:
        if a.startswith("mode="):
            mode = a.split("=", 1)[1]
    results = {}
    if mode in ("serve", "all"):
        mode_serve(results)
    if mode in ("hlo", "all"):
        mode_hlo(results)
    if mode in ("codec", "all"):
        mode_codec(results)
    os.makedirs("results/scaling", exist_ok=True)
    out = os.path.join("results", "scaling", "scaling.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main(sys.argv[1:])
