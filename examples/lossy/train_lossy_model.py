"""Lossy model training CLI (parity: ref examples/lossy/train_lossy_model.py).

Models: large_level_{1,2,4}_vae; distortions mse/mae/ms-ssim/mae-ms-ssim/
discretized_logistic; loss = beta * distortion + bpp (ref :139-213); CLIC-
style random-crop training (ref :315-323); NaN guard (ref :221-245).
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from rec_tpu.data.datasets import DatasetConfig, iterate_batches
from rec_tpu.models.lossy import (Large1LevelVAE, Large2LevelVAE,
                                  Large4LevelVAE)
from rec_tpu.parallel.mesh import (data_axis_sharding, make_mesh,
                                   replicated_sharding)
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.train.lossy import LossyTrainConfig, make_train_step
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.logging import setup_logger
from rec_tpu.utils.summary import SummaryWriter

MODELS = {
    "large_level_1_vae": lambda cfg: Large1LevelVAE(
        num_filters=cfg.level_1_filters),
    "large_level_2_vae": lambda cfg: Large2LevelVAE(
        level_1_filters=cfg.level_1_filters,
        level_2_filters=cfg.level_2_filters),
    "large_level_4_vae": lambda cfg: Large4LevelVAE(
        level_1_filters=cfg.level_1_filters,
        level_2_filters=cfg.level_2_filters,
        level_3_filters=cfg.level_3_filters,
        level_4_filters=cfg.level_4_filters),
}


@dataclasses.dataclass(frozen=True)
class Config:
    model: str = "large_level_2_vae"
    dataset: DatasetConfig = dataclasses.field(
        default_factory=lambda: DatasetConfig(dataset="clic2019",
                                              normalize="unit",
                                              crop_size=256))
    level_1_filters: int = 196
    level_2_filters: int = 128
    level_3_filters: int = 128
    level_4_filters: int = 128
    loss_fn: str = "mse"
    beta: float = 0.01
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    iters: int = 200_000
    batch_size: int = 8
    ema_decay: float = 0.999
    log_freq: int = 500
    model_save_dir: str = "checkpoints/lossy"
    log_dir: str = "logs/lossy"
    seed: int = 42


def main(argv):
    cfg = apply_overrides(Config(), argv)
    if "print_config" in argv:
        print_config(cfg)
        return
    log = setup_logger("train_lossy")
    print_config(cfg)

    model = MODELS[cfg.model](cfg)
    batches = iterate_batches(cfg.dataset, cfg.batch_size, seed=cfg.seed)
    first = jnp.asarray(next(batches))
    h, w = first.shape[1:3]

    key = jax.random.PRNGKey(cfg.seed)
    params = model.init(key, first, jax.random.PRNGKey(cfg.seed + 1))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log.info(f"{cfg.model}: {n_params / 1e6:.2f}M params")

    tx = make_optimizer(cfg.optimizer,
                        staircase_schedule(cfg.learning_rate, cfg.iters, 1.0))
    state = init_state(params, tx, beta=cfg.beta)
    ckpt = CheckpointManager(cfg.model_save_dir)
    from rec_tpu.train import save_model_config

    save_model_config(cfg.model_save_dir, cfg.model, {
        "level_1_filters": cfg.level_1_filters,
        "level_2_filters": cfg.level_2_filters,
        "level_3_filters": cfg.level_3_filters,
        "level_4_filters": cfg.level_4_filters,
        "loss_fn": cfg.loss_fn, "beta": cfg.beta})
    restored = ckpt.restore(state)
    if restored is not None:
        # The CLI's beta wins over the restored one: warm-starting a new
        # RD operating point from a neighbour's checkpoint (fine-tune at a
        # different beta) is the standard way to build the beta sweep, and
        # silently keeping the old beta would retrain the same point.
        state = restored._replace(beta=jnp.asarray(cfg.beta, jnp.float32))
        log.info(f"restored step {int(state.step)} (beta={cfg.beta})")

    step_fn = make_train_step(
        model, LossyTrainConfig(beta=cfg.beta, distortion=cfg.loss_fn,
                                ema_decay=cfg.ema_decay),
        tx, num_pixels=h * w)

    mesh = make_mesh()
    state = jax.device_put(state, replicated_sharding(mesh))
    batch_sharding = data_axis_sharding(mesh, 4)
    writer = SummaryWriter(cfg.log_dir)

    for i in range(int(state.step), cfg.iters):
        batch = jax.device_put(jnp.asarray(next(batches)), batch_sharding)
        state, metrics = step_fn(state, batch, jax.random.fold_in(key, i))
        if i % cfg.log_freq == 0:
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                # NaN sweep-and-stop (ref train_lossy_model.py:221-245).
                log.error(f"NaN loss at step {i}; stopping")
                break
            writer.scalars(i, {k: float(v) for k, v in metrics.items()})
            log.info(f"step {i}: loss={loss:.4f} "
                     f"distortion={float(metrics['distortion']):.3f} "
                     f"bpp={float(metrics['bpp']):.4f}")
            ckpt.save(jax.device_get(state))
    ckpt.save(jax.device_get(state))
    writer.close()


if __name__ == "__main__":
    main(sys.argv[1:])
