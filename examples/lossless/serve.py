"""Data-parallel batch compression serving — the production throughput path.

The reference evaluates one image at a time on CPU
(ref examples/lossless/compression_performance.py:16,345); this CLI is the
TPU-native serving equivalent the SURVEY's §2.9 plan calls for: images are
batched through ONE jitted vmapped compress program and the batch axis is
sharded over a 1-D device mesh (`rec_tpu/parallel`) — encode has no
cross-image collectives, so throughput scales with chips structurally.
Index streams land on the host that owns each image's shard, where the
native multi-stream entropy coder (cpp rec_ac/rans_encode_many, host
threads) serializes every image's .rec file in parallel.

Multi-host (SURVEY.md §2.9/§5.8): pass ``coordinator=host:port
num_processes=N process_id=i`` on every process.  The global batch shards
over all processes' devices; each process writes the .rec files for ITS
shard of the batch (host-local writes, globally-unique image ids) — there
are no cross-image collectives, so scaling is structural.  Exercised by
tests/test_multihost.py on two CPU processes.

    python examples/lossless/serve.py \
        model_cfg.num_res_blocks=24 n_beams=20 extra_samples=1.2 \
        batch_size=8 shared_pool=true codec=rans

``shared_pool=true`` selects the fast-serving beam variant (PERF.md: ~5x
batched throughput for a measured ~0.7 nats/partition quality cost).
``true_lossless=true`` (default) appends the coded residual stream to every
file, so the .rec alone recovers exact 8-bit pixels.
``verify=true`` re-reads EVERY written file, decodes it, and asserts the
reconstruction is bit-identical to the encoder's and (true_lossless) that
the residual recovers the exact pixels.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rec_tpu.coding import BeamSearchCoder, GaussianCoder
from rec_tpu.data.datasets import (DatasetConfig, load_images, normalize,
                                   pad_to_multiple)
from rec_tpu.io import read_rec, write_rec
from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                       ResNetVAEConfig)
from rec_tpu.parallel import (make_batch_compress, make_mesh)
from rec_tpu.parallel.mesh import data_axis_sharding, init_distributed
from rec_tpu.parallel.serving import global_batch_array, local_rows
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.profiling import device_fence
from rec_tpu.utils.logging import setup_logger

LOG2 = float(np.log(2.0))


@dataclasses.dataclass(frozen=True)
class Config:
    dataset: DatasetConfig = dataclasses.field(
        default_factory=lambda: DatasetConfig(dataset="cifar10",
                                              split="test"))
    model_cfg: ResNetVAEConfig = dataclasses.field(
        default_factory=ResNetVAEConfig)
    sampler: str = "beam_search"     # beam_search | importance
    n_beams: int = 20
    extra_samples: float = 1.2
    kl_per_partition: float = 3.0
    coding_bits: int = 12
    block_size: int = 1000
    max_partitions: int = 24
    stream: str = "fmix"
    shared_pool: bool = False        # fast serving mode (see PERF.md)
    codec: str = "ac"                # .rec entropy codec: ac | rans
    batch_size: int = 8              # global batch (padded to a device multiple)
    num_images: int = 16
    n_devices: int = 0               # 0 = all devices (incl. other hosts')
    pad_multiple: int = 2
    seed: int = 42
    verify: bool = True              # decode every file, assert bit-exact
    true_lossless: bool = True       # append the coded residual stream
    use_ema: bool = True
    model_save_dir: str = "checkpoints/lossless"
    output_dir: str = "results/serve"
    # Multi-host bring-up (every process passes the same coordinator and
    # num_processes, and its own process_id).
    coordinator: str = ""
    num_processes: int = 1
    process_id: int = -1


def build_coder(cfg: Config):
    if cfg.sampler == "beam_search":
        return BeamSearchCoder(kl_per_partition=cfg.kl_per_partition,
                               n_beams=cfg.n_beams,
                               extra_samples=cfg.extra_samples,
                               block_size=cfg.block_size,
                               max_partitions=cfg.max_partitions,
                               stream=cfg.stream,
                               shared_pool=cfg.shared_pool)
    if cfg.sampler == "importance":
        return GaussianCoder(kl_per_partition=cfg.kl_per_partition,
                             coding_bits=cfg.coding_bits,
                             block_size=cfg.block_size,
                             max_partitions=cfg.max_partitions,
                             stream=cfg.stream)
    raise ValueError(cfg.sampler)


def load_params(cfg: Config, model, example, mesh):
    """Initialize-or-restore params, placed for BOTH serving programs.

    Returns ``(params_global, params_local, restored)``:
      * ``params_global`` is committed replicated over the (possibly
        multi-process) mesh — the only valid placement for inputs to the
        globally-sharded batch compress.  ``CheckpointManager.restore``
        commits to the default LOCAL device, which is not a legal input to
        a global-mesh jit in multi-process serving, so we round-trip
        through the host and re-place explicitly.
      * ``params_local`` is committed to this process's default device for
        the per-image decode/verify programs, which are host-local.
    """
    params = model.init(jax.random.PRNGKey(cfg.seed), example,
                        jax.random.PRNGKey(cfg.seed + 1))
    restored = CheckpointManager(cfg.model_save_dir).restore_params(params)
    ok = restored is not None
    if ok:
        params = restored["ema_params"] if cfg.use_ema else restored["params"]
    host = jax.device_get(params)
    from rec_tpu.parallel.mesh import replicated_sharding

    params_global = jax.device_put(host, replicated_sharding(mesh))
    params_local = jax.device_put(host)
    return params_global, params_local, ok


def main(argv):
    cfg = apply_overrides(Config(), argv)
    if cfg.num_processes > 1:
        init_distributed(cfg.coordinator, cfg.num_processes, cfg.process_id)
    pid = jax.process_index()
    if pid == 0:
        print_config(cfg)
    log = setup_logger(f"serve[{pid}]")
    os.makedirs(cfg.output_dir, exist_ok=True)

    from rec_tpu.train import reconcile_model_config

    cfg = dataclasses.replace(cfg, model_cfg=reconcile_model_config(
        cfg.model_save_dir, "resnet_vae", cfg.model_cfg, log))

    mesh = make_mesh(cfg.n_devices or None)
    n_dev = mesh.devices.size
    # Pad the global batch to a device multiple so the shard is even.
    batch = -(-cfg.batch_size // n_dev) * n_dev
    log.info(f"mesh: {n_dev} device(s), {jax.process_count()} process(es); "
             f"global batch {batch}")

    coder = build_coder(cfg)
    model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=coder)

    images, synthetic = load_images(cfg.dataset)
    if synthetic:
        log.warning("using SYNTHETIC data (no local dataset found)")
    images = normalize(images, "centered")[: cfg.num_images]
    images = np.asarray(pad_to_multiple(images, cfg.pad_multiple))
    H, W = images.shape[1:3]

    params, params_local, restored = load_params(cfg, model, images[:1],
                                                 mesh)
    log.info(f"params restored from checkpoint: {restored}")
    scale = float(jnp.exp(
        params_local["params"]["likelihood_log_scale"]))

    compress = make_batch_compress(model)
    # Per-image decode for verification: local-device program, replays any
    # single file this host wrote.
    decompress_one = jax.jit(
        lambda p, ind, cnt, s: model.apply(p, (H, W), ind, cnt, s,
                                           method=model.decompress))
    max_index = (coder.n_samples if cfg.sampler == "beam_search"
                 else 1 << cfg.coding_bits)

    my_images = 0
    total_bytes = 0
    t_encode = 0.0
    first_batch = True
    for start in range(0, len(images), batch):
        chunk = images[start: start + batch]
        valid = len(chunk)
        if valid < batch:  # pad the tail batch
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - valid, axis=0)])
        seeds = cfg.seed + 101 * np.arange(start, start + batch)
        ims = global_batch_array(jnp.asarray(chunk), mesh)
        sds = global_batch_array(jnp.asarray(seeds), mesh)

        t0 = time.time()
        out = compress(params, ims, sds)
        device_fence(out)  # block_until_ready is unreliable over the tunnel
        if not first_batch:  # skip the compile batch in throughput
            t_encode += time.time() - t0

        # Each process serializes the images IT holds (host-local writes).
        ind_rows = local_rows(out["indices"])    # (N, blocks, P) per row
        cnt_rows = dict(local_rows(out["counts"]))
        rec_rows = dict(local_rows(out["reconstruction"]))
        for j, ind in ind_rows:
            i = start + j
            if j >= valid:
                continue
            counts = cnt_rows[j]
            latents = [(ind[b], counts[b])
                       for b in range(cfg.model_cfg.num_res_blocks)]
            residual = None
            if cfg.true_lossless:
                # Residual contract (io/residual.py:22-28): score against
                # the CANONICAL per-image decode — the program the decoder
                # will run.  The vmapped compress's reconstruction matches
                # it only to conv-fusion ULPs, which is not enough for the
                # quantized residual.
                from rec_tpu.io.residual import encode_residual

                canon = np.asarray(decompress_one(
                    params_local, jnp.asarray(ind), jnp.asarray(counts),
                    int(seeds[j])))[0]
                residual, _ = encode_residual(chunk[j] + 0.5, canon, scale)
            path = os.path.join(cfg.output_dir, f"img_{i}.rec")
            total_bytes += write_rec(
                path, seed=int(seeds[j]), image_shape=(H, W, 3),
                block_size=cfg.block_size, max_index=max_index,
                latents=latents, residual=residual, codec=cfg.codec)
            my_images += 1

            if cfg.verify:
                _verify_file(cfg, path, params_local, decompress_one,
                             (ind, counts), chunk[j], rec_rows[j], scale)
        first_batch = False

    if cfg.verify:
        log.info(f"verified {my_images} file(s): container round trip, "
                 f"bit-exact decode"
                 + (", exact pixel recovery" if cfg.true_lossless else ""))
    steady = max(my_images - batch // max(jax.process_count(), 1), 0)
    ips = steady / t_encode if steady and t_encode > 0 else float("nan")
    if steady and t_encode > 0:
        log.info(f"encode throughput (this process's shard): "
                 f"{ips:.2f} images/sec ({ips / max(n_dev // jax.process_count(), 1):.2f}"
                 f" images/sec/chip, steady-state, global batch {batch})")
    bpd = (total_bytes * 8.0 / (my_images * H * W * 3)
           if my_images else float("nan"))
    log.info(f"process {pid}: {my_images} images -> {total_bytes} bytes "
             f"({bpd:.3f} bits/dim incl. container, codec={cfg.codec})")
    print(f"served {my_images} images at {ips:.2f} images/sec, "
          f"{bpd:.3f} bits/dim")


def _verify_file(cfg, path, params, decompress_one, enc_latents,
                 img_centered, enc_recon, scale):
    """Full verification of ONE written file: container index round trip,
    canonical decode consistent with the encoder's embedded replay, and
    (true_lossless) exact 8-bit pixel recovery from the file alone."""
    rseed, shape, _, latents2, residual2 = read_rec(
        path, max_partitions=cfg.max_partitions, with_residual=True)
    enc_ind, enc_cnt = enc_latents
    ind = jnp.stack([jnp.asarray(a) for a, _ in latents2])
    cnt = jnp.stack([jnp.asarray(c) for _, c in latents2])
    assert np.array_equal(np.asarray(cnt), enc_cnt), f"{path}: .rec counts"
    for b in range(ind.shape[0]):
        for blk, c in enumerate(np.asarray(cnt[b])):
            assert np.array_equal(enc_ind[b, blk, :c],
                                  np.asarray(ind[b, blk, :c])), \
                f"{path}: .rec indices"
    recon = np.asarray(decompress_one(params, ind, cnt, rseed))[0]
    # The latent replay is pinned bit-exact across programs; the deconv
    # reconstruction matches the vmapped encoder's only to fusion ULPs.
    assert np.allclose(recon, enc_recon, atol=1e-4), \
        f"{path}: decode diverged from the encoder's embedded replay"
    if cfg.true_lossless:
        from rec_tpu.io.residual import decode_residual, quantize

        out01 = decode_residual(residual2, recon, scale)
        assert np.array_equal(quantize(out01), quantize(img_centered + 0.5)), \
            f"{path}: lossless pixel recovery failed"


if __name__ == "__main__":
    main(sys.argv[1:])
