"""Lossy compression eval CLI
(parity: ref examples/lossy/compress_with_lossy_model.py).

Builds an external coder (beam_search / importance), loads the model, runs
``compress(file_path, image, seed, block_size, max_index=20)`` per image,
reports PSNR / MS-SSIM vs the ideal (posterior-sampled) reconstruction, and
writes a CSV (ref :83-277).
"""

import csv
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from rec_tpu.coding import BeamSearchCoder, GaussianCoder
from rec_tpu.data.datasets import (DatasetConfig, load_images, normalize,
                                   pad_to_multiple, write_png)
from rec_tpu.models.lossy import (Large1LevelVAE, Large2LevelVAE,
                                  Large4LevelVAE, compress_to_file,
                                  decompress_from_file)
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.logging import setup_logger
from rec_tpu.utils.metrics import ms_ssim, ms_ssim_db, psnr

LOG2 = float(np.log(2.0))


@dataclasses.dataclass(frozen=True)
class Config:
    model: str = "large_level_2_vae"
    dataset: DatasetConfig = dataclasses.field(
        default_factory=lambda: DatasetConfig(dataset="kodak",
                                              normalize="unit",
                                              split="test"))
    level_1_filters: int = 196
    level_2_filters: int = 128
    level_3_filters: int = 128
    level_4_filters: int = 128
    sampler: str = "beam_search"
    n_beams: int = 10
    extra_samples: float = 1.0
    kl_per_partition: float = 3.0
    coding_bits: int = 12
    block_size: int = 1000
    max_partitions: int = 24
    stream: str = "fmix"            # candidate bit-generator: fmix | threefry
    codec: str = "ac"               # .rec entropy codec: ac | rans
    num_images: int = 4
    seed: int = 42
    use_ema: bool = True
    model_save_dir: str = "checkpoints/lossy"
    output_dir: str = "results/lossy"
    save_reconstructions: bool = False


def main(argv):
    cfg = apply_overrides(Config(), argv)
    log = setup_logger("compress_lossy")
    # Correct filter counts to the trained checkpoint's recorded config
    # (mismatched-but-structural configs restore silently).
    from rec_tpu.train import load_model_config

    saved = load_model_config(cfg.model_save_dir)
    if saved is not None:
        if saved.get("kind") != cfg.model:
            log.warning(f"checkpoint {cfg.model_save_dir} was trained as "
                        f"{saved.get('kind')}, not {cfg.model} — "
                        f"overriding model")
            cfg = dataclasses.replace(cfg, model=saved["kind"])
        filt = {k: v for k, v in saved["cfg"].items()
                if k.endswith("_filters") and getattr(cfg, k, v) != v}
        if filt:
            log.warning(f"overriding filters to match checkpoint: {filt}")
            cfg = dataclasses.replace(cfg, **filt)
    print_config(cfg)
    os.makedirs(cfg.output_dir, exist_ok=True)

    if cfg.sampler == "beam_search":
        coder = BeamSearchCoder(kl_per_partition=cfg.kl_per_partition,
                                n_beams=cfg.n_beams,
                                extra_samples=cfg.extra_samples,
                                block_size=cfg.block_size,
                                max_partitions=cfg.max_partitions,
                                stream=cfg.stream)
        max_index = coder.n_samples
    else:
        coder = GaussianCoder(kl_per_partition=cfg.kl_per_partition,
                              coding_bits=cfg.coding_bits,
                              block_size=cfg.block_size,
                              max_partitions=cfg.max_partitions,
                              stream=cfg.stream)
        max_index = 1 << cfg.coding_bits

    models = {
        "large_level_1_vae": lambda: Large1LevelVAE(
            num_filters=cfg.level_1_filters, coder=coder),
        "large_level_2_vae": lambda: Large2LevelVAE(
            level_1_filters=cfg.level_1_filters,
            level_2_filters=cfg.level_2_filters, coder=coder),
        "large_level_4_vae": lambda: Large4LevelVAE(
            level_1_filters=cfg.level_1_filters,
            level_2_filters=cfg.level_2_filters,
            level_3_filters=cfg.level_3_filters,
            level_4_filters=cfg.level_4_filters, coder=coder),
    }
    model = models[cfg.model]()

    images, synthetic = load_images(cfg.dataset)
    if synthetic:
        log.warning("using SYNTHETIC data (no local dataset found)")
    images = normalize(images, "unit")[: cfg.num_images]

    example = jnp.asarray(pad_to_multiple(images[:1], 64))
    params = model.init(jax.random.PRNGKey(cfg.seed), example,
                        jax.random.PRNGKey(cfg.seed + 1))
    restored = CheckpointManager(cfg.model_save_dir).restore_params(params)
    if restored is not None:
        params = (restored["ema_params"] if cfg.use_ema
                  else restored["params"])
        log.info("restored trained params")

    forward = jax.jit(lambda p, x, k: model.apply(p, x, k))

    rows = []
    for i, img in enumerate(images):
        x = jnp.asarray(pad_to_multiple(img[None], 64))
        num_pixels = float(np.prod(x.shape[1:3]))
        seed = cfg.seed + i

        ideal = forward(params, x, jax.random.PRNGKey(seed))
        ideal_recon = jnp.clip(ideal["reconstruction"], 0.0, 1.0)
        ideal_bpp = float(sum(ideal["kls"]) / (num_pixels * LOG2))

        path = os.path.join(cfg.output_dir, f"img_{i}.rec")
        t0 = time.time()
        recon = compress_to_file(model, params, path, x[0], seed=seed,
                                 block_size=cfg.block_size,
                                 max_index=max_index, codec=cfg.codec)
        comp_time = time.time() - t0
        recon2 = decompress_from_file(model, params, path,
                                      max_partitions=cfg.max_partitions)
        np.testing.assert_allclose(np.asarray(recon2), np.asarray(recon),
                                   rtol=1e-4, atol=1e-5)
        recon = jnp.clip(recon[None], 0.0, 1.0)

        file_bits = os.path.getsize(path) * 8
        rows.append(dict(
            index=i, seed=seed,
            ideal_bpp=ideal_bpp,
            actual_bpp=file_bits / num_pixels,
            ideal_psnr=float(psnr(x, ideal_recon)[0]),
            psnr=float(psnr(x, recon)[0]),
            ideal_ms_ssim=float(ms_ssim(x, ideal_recon)[0]),
            ms_ssim=float(ms_ssim(x, recon)[0]),
            ms_ssim_db=float(ms_ssim_db(x, recon)[0]),
            comp_time=comp_time))
        log.info(f"image {i}: bpp={rows[-1]['actual_bpp']:.4f} "
                 f"(ideal {ideal_bpp:.4f}) psnr={rows[-1]['psnr']:.2f} "
                 f"ms-ssim={rows[-1]['ms_ssim']:.4f} t={comp_time:.1f}s")
        if cfg.save_reconstructions:
            write_png(os.path.join(cfg.output_dir, f"recon_{i}.png"),
                      np.asarray(recon[0]))

    csv_path = os.path.join(cfg.output_dir,
                            f"{cfg.model}_{cfg.dataset.dataset}.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    log.info(f"wrote {csv_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
