"""Lossless generative model training CLI
(parity: ref examples/lossless/train_generative_model.py).

Usage:
    python examples/lossless/train_generative_model.py \\
        model=resnet_vae dataset.dataset=cifar10 iters=500000 \\
        model_cfg.num_res_blocks=24 lamb=0.1

Model switch (ref :33-164): ``model`` selects
  * ``vae``              — dense MNIST VAE (ref :55-68; lamb=0, lr 3e-4),
  * ``resnet_vae``       — the RVAE lossless flagship (default),
  * ``large_resnet_vae`` — the big-image model (ref :103-164; adam,
    lamb=0.01, laplace likelihood, CLIC-style random-crop training).

Knobs mirror the reference Sacred config: optimizer adamax/adam, staircase
LR drops, beta anneal, free-bits ``lamb``, EMA, checkpoints, TensorBoard
scalars + per-block KL + expected-max-KL + original/reconstruction images
(ref :458-506).  Data parallel over all visible chips.
"""

import dataclasses
import os
import sys
from typing import Optional

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from rec_tpu.data.datasets import DatasetConfig, iterate_batches
from rec_tpu.models.large_resnet_vae import (LargeResNetVAE,
                                             LargeResNetVAEConfig)
from rec_tpu.models.mnist_vae import MNISTVAE
from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                       ResNetVAEConfig)
from rec_tpu.parallel.mesh import (data_axis_sharding, make_mesh,
                                   replicated_sharding)
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.train.lossless import (LosslessTrainConfig, check_finite,
                                    make_train_step, make_vae_train_step)
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.logging import setup_logger
from rec_tpu.utils.summary import SummaryWriter


@dataclasses.dataclass(frozen=True)
class Config:
    model: str = "resnet_vae"  # vae | resnet_vae | large_resnet_vae
    dataset: DatasetConfig = dataclasses.field(
        default_factory=lambda: DatasetConfig(dataset="cifar10"))
    model_cfg: ResNetVAEConfig = dataclasses.field(
        default_factory=ResNetVAEConfig)
    large_cfg: LargeResNetVAEConfig = dataclasses.field(
        default_factory=lambda: LargeResNetVAEConfig(likelihood="laplace"))
    latent_size: int = 50            # model=vae (ref :56)
    optimizer: str = "adamax"
    learning_rate: float = 1e-3
    grad_clip_norm: float = 0.0   # 0 = off; global-norm clip before adam
    drop_learning_rate_after_iter: int = 200_000
    learning_rate_drop_rate: float = 0.316
    iters: int = 500_000
    batch_size: int = 8
    beta: float = 1.0
    lamb: float = 0.1
    anneal: bool = False
    annealing_end: int = 100_000
    ema_decay: float = 0.999
    target_bpp: Optional[float] = None
    adjust_beta_after_iters: int = 0
    log_freq: int = 500
    model_save_dir: str = "checkpoints/lossless"
    log_dir: str = "logs/lossless"
    seed: int = 42


def _model_defaults(cfg: Config, argv) -> Config:
    """Per-model config branches (ref :55-164), without clobbering explicit
    CLI overrides."""
    given = {a.split("=", 1)[0] for a in argv if "=" in a}

    def maybe(c, **kw):
        return dataclasses.replace(
            c, **{k: v for k, v in kw.items() if k not in given})

    if cfg.model == "vae":
        # ref :55-68: lr 3e-4, lamb 0, binarized-MNIST-style data in [0,1].
        cfg = maybe(cfg, learning_rate=3e-4, lamb=0.0, optimizer="adam")
        if "dataset.dataset" not in given:
            cfg = dataclasses.replace(
                cfg, dataset=dataclasses.replace(
                    cfg.dataset, dataset="mnist", normalize="unit"))
        elif "dataset.normalize" not in given:
            cfg = dataclasses.replace(
                cfg, dataset=dataclasses.replace(cfg.dataset,
                                                 normalize="unit"))
    elif cfg.model == "large_resnet_vae":
        # ref :103-164: adam, lamb 0.01, 256-crop big-image training.
        cfg = maybe(cfg, optimizer="adam", lamb=0.01)
        if "dataset.crop_size" not in given and cfg.dataset.dataset in (
                "clic2019", "kodak", "hopper512"):
            cfg = dataclasses.replace(
                cfg, dataset=dataclasses.replace(cfg.dataset, crop_size=256))
    return cfg


def build_model(cfg: Config):
    if cfg.model == "resnet_vae":
        return BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=None)
    if cfg.model == "large_resnet_vae":
        return LargeResNetVAE(cfg=cfg.large_cfg, coder=None)
    if cfg.model == "vae":
        return MNISTVAE(latents=cfg.latent_size)
    raise ValueError(cfg.model)


def main(argv):
    cfg = apply_overrides(Config(), argv)
    cfg = _model_defaults(cfg, argv)
    if "print_config" in argv:
        print_config(cfg)
        return
    log = setup_logger("train_lossless")
    print_config(cfg)

    model = build_model(cfg)
    batches = iterate_batches(cfg.dataset, cfg.batch_size, seed=cfg.seed)
    first = jnp.asarray(next(batches))
    h, w = first.shape[1:3]

    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, first, jax.random.PRNGKey(cfg.seed + 1))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log.info(f"model={cfg.model} initialized: {n_params / 1e6:.2f}M params")

    tx = make_optimizer(cfg.optimizer,
                        staircase_schedule(cfg.learning_rate,
                                           cfg.drop_learning_rate_after_iter,
                                           cfg.learning_rate_drop_rate),
                        clip_norm=cfg.grad_clip_norm)
    state = init_state(params, tx, beta=cfg.beta)

    ckpt = CheckpointManager(cfg.model_save_dir)
    # Record the trained architecture next to the checkpoints so eval CLIs
    # can detect/correct a model-config mismatch (structure-identical
    # configs restore silently and poison every metric).
    from rec_tpu.train import save_model_config

    if cfg.model == "large_resnet_vae":
        save_model_config(cfg.model_save_dir, "large_resnet_vae",
                          cfg.large_cfg)
    elif cfg.model == "resnet_vae":
        save_model_config(cfg.model_save_dir, "resnet_vae", cfg.model_cfg)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        log.info(f"restored checkpoint at step {int(state.step)}")

    train_cfg = LosslessTrainConfig(
        beta=cfg.beta, lamb=cfg.lamb, anneal=cfg.anneal,
        annealing_end=cfg.annealing_end, ema_decay=cfg.ema_decay,
        target_bpp=cfg.target_bpp,
        adjust_beta_after_iters=cfg.adjust_beta_after_iters)
    make_step = make_vae_train_step if cfg.model == "vae" else make_train_step
    step_fn = make_step(model, train_cfg, tx, num_pixels=h * w)

    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    batch_sharding = data_axis_sharding(mesh, 4)

    writer = SummaryWriter(cfg.log_dir)
    start = int(state.step)
    for i in range(start, cfg.iters):
        batch = jax.device_put(jnp.asarray(next(batches)), batch_sharding)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        if i % cfg.log_freq == 0:
            check_finite(metrics)
            recon = metrics.pop("reconstruction")
            kl_blocks = np.asarray(metrics.pop("kl_per_block"))
            scalars = {k: float(v) for k, v in metrics.items()}
            # Per-block KL scalars (ref :505-506 logs KL/dim_{i+1}).
            scalars.update({f"KL/dim_{b + 1}": float(v)
                            for b, v in enumerate(kl_blocks)})
            writer.scalars(i, scalars)
            # Original + reconstruction image summaries (ref :503-504).
            shift = 0.0 if cfg.dataset.normalize == "unit" else 0.5
            writer.images(i, "Original", np.asarray(batch[:4]) + shift)
            writer.images(i, "Reconstruction", np.asarray(recon[:4]))
            log.info(f"step {i}: loss={float(metrics['loss']):.3f} "
                     f"nll={float(metrics['nll']):.3f} "
                     f"kl={float(metrics['kl']):.3f} "
                     f"bpd={float(metrics['elbo_bpd']):.3f} "
                     f"max_kl={float(metrics['expected_max_kl']):.3f}")
            ckpt.save(jax.device_get(state))
    ckpt.save(jax.device_get(state))
    writer.close()


if __name__ == "__main__":
    main(sys.argv[1:])
