"""Lossless compression evaluation CLI
(parity: ref examples/lossless/compression_performance.py).

Modes:
  * ``mode=compress``   — per test image: ideal-ELBO metrics, REC compress,
    .rec write + read-back with an index round-trip assertion, decode,
    per-image CSV row (bits/dim, ideal bpp, PSNR, comp time, ...).
  * ``mode=initialize`` — fit the coder's auxiliary-variance ratios on test
    images and persist them (ref :151-210).
  * ``mode=update_sampler`` — fit the rejection sampler's acceptance-
    probability buffers over test images for codelength estimates and
    persist them (ref :299-303 + samplers.py:134-157).

Unlike the reference (which pins TF to CPU, ref :16), compression runs on
the TPU; only arithmetic coding is host-side.
"""

import dataclasses
import csv
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
from rec_tpu.data.datasets import (DatasetConfig, iterate_batches,
                                   load_images, normalize, pad_to_multiple,
                                   write_png)
from rec_tpu.io import read_rec, write_rec
from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                       ResNetVAEConfig)
from rec_tpu.train import CheckpointManager, init_state, make_optimizer, staircase_schedule
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.logging import setup_logger
from rec_tpu.utils.metrics import psnr
from rec_tpu.utils.summary import SummaryWriter

LOG2 = float(np.log(2.0))


@dataclasses.dataclass(frozen=True)
class Config:
    mode: str = "compress"           # compress | initialize
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
    stream: str = "fmix"            # candidate bit-generator: fmix | threefry
    codec: str = "ac"               # .rec entropy codec: ac | rans
    num_images: int = 10
    pad_multiple: int = 2  # x64 only needed by the /64-downsampling models (ref pads to x64, :311-312)
    seed: int = 42
    # Grow max_partitions to fit the probed per-block KL (the reference's
    # dynamic ceil(KL/Omega) has no static budget to overflow).
    auto_max_partitions: bool = True
    true_lossless: bool = True   # also code the residual stream (beyond the
                                 # reference, which only counts those bits)
    use_ema: bool = True
    model_save_dir: str = "checkpoints/lossless"
    output_dir: str = "results/lossless"
    save_reconstructions: bool = False


def build_coder(cfg: Config):
    if cfg.sampler == "beam_search":
        return BeamSearchCoder(kl_per_partition=cfg.kl_per_partition,
                               n_beams=cfg.n_beams,
                               extra_samples=cfg.extra_samples,
                               block_size=cfg.block_size,
                               max_partitions=cfg.max_partitions,
                               stream=cfg.stream)
    if cfg.sampler == "importance":
        return GaussianCoder(kl_per_partition=cfg.kl_per_partition,
                             coding_bits=cfg.coding_bits,
                             block_size=cfg.block_size,
                             max_partitions=cfg.max_partitions,
                             stream=cfg.stream)
    raise ValueError(cfg.sampler)


def load_params(cfg: Config, model, example):
    """Restore trained params (EMA swapped in, ref :199,268), or
    fresh-initialize when no checkpoint exists."""
    import optax

    params = model.init(jax.random.PRNGKey(cfg.seed), example,
                        jax.random.PRNGKey(cfg.seed + 1))
    tx = make_optimizer("adamax", staircase_schedule(1e-3, 200_000, 0.316))
    state = init_state(params, tx, beta=1.0)
    ckpt = CheckpointManager(cfg.model_save_dir)
    restored = ckpt.restore(state)
    if restored is None:
        return params, False
    return (restored.ema_params if cfg.use_ema else restored.params), True


def initialize_coder_ratios(cfg: Config, log):
    """mode=initialize: fit aux-variance ratios over test images and persist
    them (ref :151-210).  The fitted table is saved as
    ``<model_save_dir>/coder_ratios_<Omega>.npy`` and picked up by
    mode=compress."""
    from rec_tpu.coding.partition import (plan_split, split_pair,
                                          split_permutation)
    from rec_tpu.coding import rng as crng
    from rec_tpu.coding.gauss import GaussianParams
    from rec_tpu.coding.ratio_fit import RatioFitConfig, RatioFitter

    model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=None)
    images, synthetic = load_images(cfg.dataset)
    images = normalize(images, "centered")[: cfg.num_images]
    example = jnp.asarray(pad_to_multiple(images[:1], cfg.pad_multiple))
    params, restored = load_params(cfg, model, example)

    forward = jax.jit(lambda p, x, k: model.apply(p, x, k))
    # Size the table well past the eval budget: the fitter only fills the
    # entries the data actually reaches, and encode-time indices beyond the
    # table extrapolate by power law (partition.aux_variance_ratio) — but a
    # fitted entry always beats extrapolation, so fit as deep as the data.
    fitter = RatioFitter(RatioFitConfig(kl_per_partition=cfg.kl_per_partition),
                         max_partitions=max(192, cfg.max_partitions))
    key = jax.random.PRNGKey(cfg.seed)
    for i, img in enumerate(images):
        x = jnp.asarray(pad_to_multiple(img[None], cfg.pad_multiple))
        out = forward(params, x, jax.random.fold_in(key, i))
        log.info(f"init image {i}: "
                 f"total kl={float(jnp.sum(out['analytic_kl'])):.0f}")
        # Fit on the actual per-res-block posterior/prior pairs, split into
        # the same equal-size latent blocks the coder uses.
        post, prior = out["posterior"], out["prior"]
        for n in range(cfg.model_cfg.num_res_blocks):
            p_n = GaussianParams(post.loc[n], post.scale[n])
            c_n = GaussianParams(prior.loc[n], prior.scale[n])
            plan = plan_split(int(p_n.loc.size), cfg.block_size)
            perm = split_permutation(crng.root_key(cfg.seed + i), plan)
            t_blocks, c_blocks = split_pair(p_n, c_n, plan, perm)
            fitter.update(t_blocks, c_blocks,
                          jax.random.fold_in(key, 1000 + i * 64 + n))
    path = os.path.join(cfg.model_save_dir,
                        f"coder_ratios_{cfg.kl_per_partition}.npy")
    os.makedirs(cfg.model_save_dir, exist_ok=True)
    np.save(path, np.asarray(fitter.fitted()))
    log.info(f"saved fitted ratios to {path}")


def update_rejection_sampler(cfg: Config, log):
    """mode=update_sampler: run the rejection coder's update pass over the
    per-res-block aux pairs of test images and persist the averaged
    acceptance probabilities."""
    from rec_tpu.coding import RejectionCoder
    from rec_tpu.coding.gauss import GaussianParams
    from rec_tpu.coding.partition import (plan_split, split_pair,
                                          split_permutation)
    from rec_tpu.coding import rng as crng

    model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=None)
    images, _ = load_images(cfg.dataset)
    images = normalize(images, "centered")[: cfg.num_images]
    example = jnp.asarray(pad_to_multiple(images[:1], cfg.pad_multiple))
    params, _ = load_params(cfg, model, example)
    forward = jax.jit(lambda p, x, k: model.apply(p, x, k))

    rc = RejectionCoder(kl_per_partition=cfg.kl_per_partition)
    for i, img in enumerate(images):
        x = jnp.asarray(pad_to_multiple(img[None], cfg.pad_multiple))
        out = forward(params, x, jax.random.PRNGKey(cfg.seed + i))
        post, prior = out["posterior"], out["prior"]
        for n in range(cfg.model_cfg.num_res_blocks):
            p_n = GaussianParams(post.loc[n], post.scale[n])
            c_n = GaussianParams(prior.loc[n], prior.scale[n])
            plan = plan_split(int(p_n.loc.size), cfg.block_size)
            perm = split_permutation(crng.root_key(cfg.seed + i), plan)
            tb, cb = split_pair(p_n, c_n, plan, perm)
            # First block is representative; update is a running average.
            rc.encode_block(GaussianParams(tb.loc[0], tb.scale[0]),
                            GaussianParams(cb.loc[0], cb.scale[0]),
                            seed=cfg.seed + i * 64 + n, update_sampler=True)
        log.info(f"update_sampler image {i} done")
    path = os.path.join(cfg.model_save_dir, "rejection_acceptance.npy")
    os.makedirs(cfg.model_save_dir, exist_ok=True)
    np.save(path, rc.sampler.acceptance_probabilities)
    log.info(f"saved acceptance probabilities to {path} "
             f"(spillover p={rc.sampler.spillover_probability:.3e})")


def main(argv):
    cfg = apply_overrides(Config(), argv)
    print_config(cfg)
    log = setup_logger("compression_performance")
    os.makedirs(cfg.output_dir, exist_ok=True)

    if cfg.mode == "initialize":
        initialize_coder_ratios(cfg, log)
        return
    if cfg.mode == "update_sampler":
        update_rejection_sampler(cfg, log)
        return

    coder = build_coder(cfg)
    ratio_path = os.path.join(cfg.model_save_dir,
                              f"coder_ratios_{cfg.kl_per_partition}.npy")
    if os.path.exists(ratio_path):
        coder = dataclasses.replace(
            coder, aux_variance_ratios=tuple(np.load(ratio_path).tolist()))
        log.info(f"using fitted aux ratios from {ratio_path}")
    model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=coder)

    images, synthetic = load_images(cfg.dataset)
    if synthetic:
        log.warning("using SYNTHETIC data (no local dataset found)")
    images = normalize(images, "centered")[: cfg.num_images]

    example = jnp.asarray(pad_to_multiple(images[:1], cfg.pad_multiple))
    params, restored = load_params(cfg, model, example)
    log.info(f"params restored from checkpoint: {restored}")

    forward = jax.jit(lambda p, x, k: model.apply(p, x, k))

    if cfg.auto_max_partitions:
        # Size the static partition budget to the data, like the reference's
        # dynamic ceil(KL/Omega) loop (ref coder.py:501): probe the first
        # image's per-res-block posterior/prior pairs and grow
        # max_partitions to the max required count (rounded up to 8).  A
        # too-small budget silently truncates blocks and cascades into a
        # garbage reconstruction (see the saturation warning below).
        from rec_tpu.coding.gauss import GaussianParams as GP

        probe = forward(params, example, jax.random.PRNGKey(cfg.seed))
        need = 1
        for n in range(cfg.model_cfg.num_res_blocks):
            p_n = GP(probe["posterior"].loc[n], probe["posterior"].scale[n])
            c_n = GP(probe["prior"].loc[n], probe["prior"].scale[n])
            need = max(need, coder.required_partitions(p_n, c_n, cfg.seed))
        if need > cfg.max_partitions:
            budget = -(-int(need * 1.25) // 8) * 8  # 25% headroom, x8 round
            log.warning(
                f"max_partitions={cfg.max_partitions} < required {need}; "
                f"auto-sizing to {budget} (disable with "
                "auto_max_partitions=False)")
            coder = dataclasses.replace(coder, max_partitions=budget)
            model = BidirectionalResNetVAE(cfg=cfg.model_cfg, coder=coder)
            cfg = dataclasses.replace(cfg, max_partitions=budget)
    compress = jax.jit(
        lambda p, x, s: model.apply(p, x, s, method=model.compress))
    decompress = jax.jit(
        lambda p, shape, ind, cnt, s: model.apply(
            p, shape, ind, cnt, s, method=model.decompress),
        static_argnums=1)

    csv_path = os.path.join(cfg.output_dir, f"{cfg.dataset.dataset}.csv")
    fields = ["index", "width", "height", "seed", "total_kl",
              "ideal_elbo_bpd", "ideal_psnr", "ideal_ms_ssim",
              "latent_code_bits", "file_bits",
              "total_bits_per_dim", "residual_bits", "psnr", "ms_ssim",
              "comp_time", "decomp_time", "roundtrip_ok",
              "saturated_blocks"]
    rows = []
    crashes = 0
    for i, img in enumerate(images):
        try:
            rows.append(_compress_one(cfg, log, model, coder, params, i, img,
                                      forward, compress, decompress))
        except Exception as e:  # per-image catch-and-continue (ref :375-377)
            crashes += 1
            log.error(f"image {i} failed: {type(e).__name__}: {e}")

    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)
    log.info(f"wrote {csv_path}; images={len(rows)} crashes={crashes}; "
             f"mean bpd="
             f"{np.mean([r['total_bits_per_dim'] for r in rows]):.3f}")


def _ms_ssim_auto(a, b):
    """MS-SSIM with the scale count sized to the image (the standard 5
    scales need min(H, W) >= 176; CIFAR-sized images use fewer, with the
    weight vector renormalized)."""
    from rec_tpu.utils.metrics import _MSSSIM_WEIGHTS, ms_ssim

    scales = 1
    side = min(a.shape[1], a.shape[2])
    while scales < 5 and side >= 11 * (2 ** scales):
        scales += 1
    w = np.asarray(_MSSSIM_WEIGHTS[:scales])
    return float(ms_ssim(a, b, weights=w / w.sum())[0])


def _compress_one(cfg, log, model, coder, params, i, img, forward, compress,
                  decompress):
    x = jnp.asarray(pad_to_multiple(img[None], cfg.pad_multiple))
    h, w = x.shape[1:3]
    num_dims = float(np.prod(x.shape[1:]))
    seed = cfg.seed + i

    # Ideal pass: ELBO metrics + uncoded-reconstruction quality
    # (ref :321-342 and the ideal_PSNR/ideal_MS_SSIM CSV columns, :280-297).
    out = forward(params, x, jax.random.PRNGKey(seed))
    ideal_elbo_bpd = float(
        (-jnp.mean(out["log_likelihood"])
         + jnp.sum(jnp.mean(out["analytic_kl"], axis=1)))
        / (num_dims * LOG2))
    ideal_psnr = float(psnr(x + 0.5, out["reconstruction"])[0])
    ideal_ms = _ms_ssim_auto(x + 0.5, out["reconstruction"])

    t0 = time.time()
    comp = jax.block_until_ready(compress(params, x, seed))
    comp_time = time.time() - t0

    # A block whose count hits the static budget was truncated: its coded
    # sample is a poor posterior approximation, later blocks' priors are
    # conditioned on it and diverge, and the residual stream balloons.
    # Silent truncation reads as "compressed fine" with terrible bpd, so
    # surface it loudly (cf. ref coder.py:226-230, which raises instead).
    saturated = int(np.sum(np.asarray(comp["counts"]) == cfg.max_partitions))
    if saturated:
        log.warning(
            f"image {i}: {saturated} latent block(s) hit "
            f"max_partitions={cfg.max_partitions} — the KL budget is too "
            f"small for this model; rerun with a larger max_partitions")

    rec_path = os.path.join(cfg.output_dir, f"img_{i}.rec")
    latents = [(np.asarray(comp["indices"][b]),
                np.asarray(comp["counts"][b]))
               for b in range(cfg.model_cfg.num_res_blocks)]
    # Raw index arrays alongside the .rec file (ref :352 saves
    # <image>_block_indices.npy per image for offline analysis).
    np.save(os.path.join(cfg.output_dir, f"block_indices_{i}.npy"),
            np.asarray(comp["indices"]))
    max_index = (coder.n_samples if cfg.sampler == "beam_search"
                 else 1 << cfg.coding_bits)

    residual = None
    scale = float(jnp.exp(params["params"]["likelihood_log_scale"]))
    if cfg.true_lossless:
        # Score the residual against the decode replay's reconstruction
        # (encoder embeds decoder), then the file alone is lossless.
        from rec_tpu.io.residual import encode_residual

        dec_recon = decompress(
            params, (h, w),
            jnp.stack([jnp.asarray(a) for a, _ in latents]),
            jnp.stack([jnp.asarray(c) for _, c in latents]), seed)
        residual, _ = encode_residual(np.asarray(x[0]) + 0.5,
                                      np.asarray(dec_recon[0]), scale)

    nbytes = write_rec(rec_path, seed=seed, image_shape=(h, w, 3),
                       block_size=cfg.block_size, max_index=max_index,
                       latents=latents, residual=residual, codec=cfg.codec)

    # Read back + index round-trip assertion (ref :369-373).
    rseed, _, _, latents2, residual2 = read_rec(
        rec_path, max_partitions=cfg.max_partitions, with_residual=True)
    ok = all(np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
             for a, b in zip(latents, latents2))
    assert ok, "index round trip failed"

    ind = jnp.stack([jnp.asarray(a) for a, _ in latents2])
    cnt = jnp.stack([jnp.asarray(c) for _, c in latents2])
    t0 = time.time()
    recon = jax.block_until_ready(
        decompress(params, (h, w), ind, cnt, rseed))
    decomp_time = time.time() - t0

    # Residual bits: actual coded bits when true_lossless, else the
    # reference's implicit -log2 likelihood count (SURVEY.md §0).
    if residual is not None:
        from rec_tpu.io.residual import decode_residual, quantize

        out01 = decode_residual(residual2, np.asarray(recon[0]), scale)
        assert np.array_equal(quantize(out01),
                              quantize(np.asarray(x[0]) + 0.5)), \
            "lossless pixel recovery failed"
        residual_bits = len(residual2) * 8.0
    else:
        from rec_tpu.models.likelihoods import discretized_logistic

        residual_bits = float(-discretized_logistic(
            x, recon - 0.5, scale)[0] / LOG2)
    from rec_tpu.coding import CodedLatent

    latent_bits = float(coder.codelength_nats(
        CodedLatent(ind, cnt, None)) / LOG2)
    total_bpd = (latent_bits + residual_bits) / num_dims
    p = float(psnr(x + 0.5, recon)[0])

    row = dict(index=i, width=w, height=h, seed=seed,
               total_kl=float(jnp.sum(comp["kl"])),
               ideal_elbo_bpd=ideal_elbo_bpd,
               ideal_psnr=ideal_psnr, ideal_ms_ssim=ideal_ms,
               latent_code_bits=latent_bits,
               file_bits=nbytes * 8,
               total_bits_per_dim=total_bpd,
               residual_bits=residual_bits,
               psnr=p, ms_ssim=_ms_ssim_auto(x + 0.5, recon),
               comp_time=comp_time,
               decomp_time=decomp_time, roundtrip_ok=ok,
               saturated_blocks=saturated)
    log.info(f"image {i}: kl={row['total_kl']:.0f} "
             f"bpd={total_bpd:.3f} ideal={ideal_elbo_bpd:.3f} "
             f"comp={comp_time:.2f}s ok={ok}")
    if cfg.save_reconstructions:
        write_png(os.path.join(cfg.output_dir, f"recon_{i}.png"),
                  np.asarray(recon[0]))
    return row


if __name__ == "__main__":
    main(sys.argv[1:])
