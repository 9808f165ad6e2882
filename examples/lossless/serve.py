"""Data-parallel batch compression serving — the production throughput path.

The reference evaluates one image at a time on CPU
(ref examples/lossless/compression_performance.py:16,345); this CLI is the
TPU-native serving equivalent the SURVEY's §2.9 plan calls for: images are
batched through ONE jitted vmapped compress program and the batch axis is
sharded over a 1-D device mesh (`rec_tpu/parallel`) — encode has no
cross-image collectives, so throughput scales with chips structurally.
Index streams gather to the host, where the native multi-stream entropy
coder (cpp rec_ac/rans_encode_many, host threads) serializes every image's
.rec file in parallel.

    python examples/lossless/serve.py \
        model_cfg.num_res_blocks=24 n_beams=20 extra_samples=1.2 \
        batch_size=8 shared_pool=true codec=rans

``shared_pool=true`` selects the fast-serving beam variant (PERF.md: ~5x
batched throughput for a measured ~0.7 nats/partition quality cost).
``verify=true`` decodes every file back and asserts the reconstruction is
bit-identical to the encoder's (the encoder embeds the decoder).
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

from rec_tpu.coding import BeamSearchCoder, CodedLatent, GaussianCoder
from rec_tpu.data.datasets import (DatasetConfig, load_images, normalize,
                                   pad_to_multiple)
from rec_tpu.io import read_rec, write_rec
from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                       ResNetVAEConfig)
from rec_tpu.parallel import (make_batch_compress, make_batch_decompress,
                              make_mesh, shard_images)
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.utils.config import apply_overrides, print_config
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
    n_devices: int = 0               # 0 = all local devices
    pad_multiple: int = 2
    seed: int = 42
    verify: bool = True              # decode each file, assert bit-exact
    use_ema: bool = True
    model_save_dir: str = "checkpoints/lossless"
    output_dir: str = "results/serve"


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


def load_params(cfg: Config, model, example):
    params = model.init(jax.random.PRNGKey(cfg.seed), example,
                        jax.random.PRNGKey(cfg.seed + 1))
    tx = make_optimizer("adamax", staircase_schedule(1e-3, 200_000, 0.316))
    state = init_state(params, tx, beta=1.0)
    restored = CheckpointManager(cfg.model_save_dir).restore(state)
    if restored is None:
        return params, False
    return (restored.ema_params if cfg.use_ema else restored.params), True


def main(argv):
    cfg = apply_overrides(Config(), argv)
    print_config(cfg)
    log = setup_logger("serve")
    os.makedirs(cfg.output_dir, exist_ok=True)

    mesh = make_mesh(cfg.n_devices or None)
    n_dev = mesh.devices.size
    # Pad the global batch to a device multiple so the shard is even.
    batch = -(-cfg.batch_size // n_dev) * n_dev
    log.info(f"mesh: {n_dev} device(s); global batch {batch}")

    coder = build_coder(cfg)
    model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=coder)

    images, synthetic = load_images(cfg.dataset)
    if synthetic:
        log.warning("using SYNTHETIC data (no local dataset found)")
    images = normalize(images, "centered")[: cfg.num_images]
    images = np.asarray(pad_to_multiple(images, cfg.pad_multiple))
    H, W = images.shape[1:3]

    params, restored = load_params(cfg, model, images[:1])
    log.info(f"params restored from checkpoint: {restored}")

    compress = make_batch_compress(model)
    decompress = make_batch_decompress(model, (H, W))
    max_index = (coder.n_samples if cfg.sampler == "beam_search"
                 else 1 << cfg.coding_bits)

    total_images = 0
    total_bytes = 0
    t_encode = 0.0
    for start in range(0, len(images), batch):
        chunk = images[start: start + batch]
        valid = len(chunk)
        if valid < batch:  # pad the tail batch
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch - valid, axis=0)])
        seeds = cfg.seed + 101 * np.arange(start, start + batch)
        ims, sds = shard_images(jnp.asarray(chunk), jnp.asarray(seeds), mesh)

        t0 = time.time()
        out = jax.block_until_ready(compress(params, ims, sds))
        if total_images:  # skip the compile batch in throughput
            t_encode += time.time() - t0

        indices = np.asarray(out["indices"])   # (batch, N, blocks, P)
        counts = np.asarray(out["counts"])     # (batch, N, blocks)
        for j in range(valid):
            i = start + j
            latents = [(indices[j, b], counts[j, b])
                       for b in range(cfg.model_cfg.num_res_blocks)]
            path = os.path.join(cfg.output_dir, f"img_{i}.rec")
            total_bytes += write_rec(
                path, seed=int(seeds[j]), image_shape=(H, W, 3),
                block_size=cfg.block_size, max_index=max_index,
                latents=latents, codec=cfg.codec)
        total_images += valid

        if cfg.verify:
            dec = jax.block_until_ready(decompress(
                params, jnp.asarray(indices), jnp.asarray(counts),
                jnp.asarray(seeds)))
            same = np.array_equal(np.asarray(out["reconstruction"])[:valid],
                                  np.asarray(dec)[:valid])
            assert same, "batched decode != encoder's embedded replay"
            # Container round trip on the first file of the batch (the file
            # stores only the first counts[b] indices per block; the rest
            # read back as zeros).
            rseed, _, _, lat2 = read_rec(
                os.path.join(cfg.output_dir, f"img_{start}.rec"),
                max_partitions=cfg.max_partitions)
            assert rseed == int(seeds[0]), ".rec seed mismatch"
            for b, (ind2, cnt2) in enumerate(lat2):
                assert np.array_equal(counts[0, b], cnt2), ".rec counts"
                for blk, c in enumerate(np.asarray(cnt2)):
                    assert np.array_equal(indices[0, b, blk, :c],
                                          ind2[blk, :c]), ".rec indices"

    steady = max(total_images - batch, 0)
    if steady and t_encode > 0:
        ips = steady / t_encode
        log.info(f"encode throughput: {ips:.2f} images/sec total, "
                 f"{ips / n_dev:.2f} images/sec/chip (steady-state, "
                 f"batch {batch})")
    bpd = total_bytes * 8.0 / (total_images * H * W * 3)
    log.info(f"{total_images} images -> {total_bytes} bytes "
             f"({bpd:.3f} bits/dim incl. container, codec={cfg.codec})")
    print(f"served {total_images} images at "
          f"{(steady / t_encode) if steady and t_encode else float('nan'):.2f}"
          f" images/sec, {bpd:.3f} bits/dim")


if __name__ == "__main__":
    main(sys.argv[1:])
