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

Model switch (ref runs both RVAE and LargeResNetVAE through every mode,
ref :117,172-173,241-242): ``model=resnet_vae`` (default, CIFAR-class) or
``model=large_resnet_vae`` (Kodak-class big images, ×64 padding).

Unlike the reference (which pins TF to CPU, ref :16), compression runs on
the TPU; only arithmetic coding is host-side.  Per-phase timings
(forward / encode / container / decode / residual) accumulate in a
PhaseTimer and are dumped to ``<output_dir>/phase_times.json``.
"""

import dataclasses
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

# "highest" forces true-f32 conv accumulation (use via
# ``matmul_precision=highest``) for diagnosing platform-sensitive stats.
# Note it is NOT a cure for ill-conditioned inputs: on pygame's empty-room
# webcam photo the corpus model's forward pass is genuinely unstable (CPU
# f32, TPU bf16 and TPU f32-highest all disagree wildly — ideal "ELBO"
# 6.5 / 348 / 345 bpd) and highest-precision coding there was *worse*
# (8.18 vs 6.57 coded bpd) while the budget cap + residual stream kept both
# runs exactly lossless.  The honest fix for such photos is the cap, not
# precision.
if "matmul_precision=highest" in sys.argv:
    sys.argv.remove("matmul_precision=highest")
    jax.config.update("jax_default_matmul_precision", "highest")

from rec_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from rec_tpu.coding import BeamSearchCoder, GaussianCoder
from rec_tpu.coding.gauss import GaussianParams
from rec_tpu.data.datasets import (DatasetConfig, load_images, normalize,
                                   pad_to_multiple, write_png)
from rec_tpu.io import read_rec, write_rec
from rec_tpu.models.large_resnet_vae import (LargeResNetVAE,
                                             LargeResNetVAEConfig)
from rec_tpu.models.resnet_vae import (BidirectionalResNetVAE,
                                       ResNetVAEConfig)
from rec_tpu.train import (CheckpointManager, init_state, make_optimizer,
                           staircase_schedule)
from rec_tpu.utils.config import apply_overrides, print_config
from rec_tpu.utils.logging import setup_logger
from rec_tpu.utils.metrics import psnr
from rec_tpu.utils.profiling import PhaseTimer, device_fence

LOG2 = float(np.log(2.0))


@dataclasses.dataclass(frozen=True)
class Config:
    mode: str = "compress"           # compress | initialize | update_sampler
    model: str = "resnet_vae"        # resnet_vae | large_resnet_vae
    dataset: DatasetConfig = dataclasses.field(
        default_factory=lambda: DatasetConfig(dataset="cifar10",
                                              split="test"))
    model_cfg: ResNetVAEConfig = dataclasses.field(
        default_factory=ResNetVAEConfig)
    large_cfg: LargeResNetVAEConfig = dataclasses.field(
        default_factory=lambda: LargeResNetVAEConfig(
            likelihood="discretized_logistic"))
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
    pad_multiple: int = 0  # 0 = per-model default: ×2 for the RVAE (/2
    # first conv), ×64 for the large model (ref resizes to ×64, :311-312)
    seed: int = 42
    # Grow max_partitions to fit the probed per-block KL (the reference's
    # dynamic ceil(KL/Omega) has no static budget to overflow).
    auto_max_partitions: bool = True
    # Hard ceiling on the auto-grown budget.  A single far-off-distribution
    # image can probe a pathological requirement (observed: 8.9e6 partitions
    # from an underflowed posterior scale); past the cap the affected blocks
    # saturate (counts clamp, warned + CSV'd) and the residual stream still
    # guarantees exact pixels, so capping trades latent-stream efficiency
    # for a bounded schedule instead of an unbounded compile.
    max_budget: int = 8192
    # Re-probe the required budget per image (the first-image probe can
    # undershoot a later image's KL); recompilation only happens when a
    # later image actually needs a bigger budget.
    probe_every_image: bool = True
    true_lossless: bool = True   # also code the residual stream (beyond the
                                 # reference, which only counts those bits)
    tile: int = 0  # >0: compress each image as independent tile x tile
                   # patches (per-image totals aggregated in the CSV) —
                   # keeps a patch-trained model in its trained regime
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


class ModelAdapter:
    """Uniform view over the two lossless model families.

    Normalizes compress/decompress to a per-group ``latents`` list of
    (indices (blocks, P), counts (blocks,)) in top-down transmission order —
    the RVAE stacks its N res blocks (same shapes), the large model keeps a
    2-tuple (different shapes per group).
    """

    def __init__(self, cfg: Config, coder):
        self.kind = cfg.model
        if cfg.model == "resnet_vae":
            self.model = BidirectionalResNetVAE(cfg=cfg.model_cfg,
                                                coder=coder)
            self.n_groups = cfg.model_cfg.num_res_blocks
        elif cfg.model == "large_resnet_vae":
            self.model = LargeResNetVAE(cfg=cfg.large_cfg, coder=coder)
            self.n_groups = 2
        else:
            raise ValueError(cfg.model)
        self.forward = jax.jit(lambda p, x, k: self.model.apply(p, x, k))
        self._compress = jax.jit(
            lambda p, x, s: self.model.apply(p, x, s,
                                             method=self.model.compress))
        if cfg.model == "resnet_vae":
            self._decompress = jax.jit(
                lambda p, shape, ind, cnt, s: self.model.apply(
                    p, shape, ind, cnt, s, method=self.model.decompress),
                static_argnums=1)
        else:
            self._decompress = jax.jit(
                lambda p, shape, latents, s: self.model.apply(
                    p, shape, latents, s, method=self.model.decompress),
                static_argnums=1)

    def pairs(self, out):
        """Per-group (posterior, prior) GaussianParams in top-down order."""
        if self.kind == "resnet_vae":
            post, prior = out["posterior"], out["prior"]
            return [(GaussianParams(post.loc[n], post.scale[n]),
                     GaussianParams(prior.loc[n], prior.scale[n]))
                    for n in range(self.n_groups)]
        return list(out["posterior_prior_pairs"])

    def compress(self, params, x, seed):
        """Returns (latents list, total_kl, reconstruction)."""
        comp = self._compress(params, x, seed)
        device_fence(comp)  # block_until_ready is unreliable over the tunnel
        if self.kind == "resnet_vae":
            latents = [(np.asarray(comp["indices"][b]),
                        np.asarray(comp["counts"][b]))
                       for b in range(self.n_groups)]
        else:
            latents = [(np.asarray(i), np.asarray(c))
                       for i, c in comp["latents"]]
        return latents, float(jnp.sum(comp["kl"])), comp["reconstruction"]

    def decompress(self, params, shape, latents, seed):
        if self.kind == "resnet_vae":
            ind = jnp.stack([jnp.asarray(a) for a, _ in latents])
            cnt = jnp.stack([jnp.asarray(c) for _, c in latents])
            return self._decompress(params, shape, ind, cnt, seed)
        lat = [(jnp.asarray(a), jnp.asarray(c)) for a, c in latents]
        return self._decompress(params, shape, lat, seed)


def pad_multiple_for(cfg: Config) -> int:
    if cfg.pad_multiple:
        return cfg.pad_multiple
    return 64 if cfg.model == "large_resnet_vae" else 2


def load_params(cfg: Config, model, example):
    """Restore trained params (EMA swapped in, ref :199,268), or
    fresh-initialize when no checkpoint exists.  Uses the params-only
    restore so evaluation never depends on the training optimizer's
    state tree."""
    params = model.init(jax.random.PRNGKey(cfg.seed), example,
                        jax.random.PRNGKey(cfg.seed + 1))
    restored = CheckpointManager(cfg.model_save_dir).restore_params(params)
    if restored is None:
        return params, False
    return (restored["ema_params"] if cfg.use_ema
            else restored["params"]), True


def initialize_coder_ratios(cfg: Config, log):
    """mode=initialize: fit aux-variance ratios over test images and persist
    them (ref :151-210).  The fitted table is saved as
    ``<model_save_dir>/coder_ratios_<Omega>.npy`` and picked up by
    mode=compress."""
    from rec_tpu.coding.partition import (plan_split, split_pair,
                                          split_permutation)
    from rec_tpu.coding import rng as crng
    from rec_tpu.coding.ratio_fit import RatioFitConfig, RatioFitter

    adapter = ModelAdapter(cfg, None)
    pad = pad_multiple_for(cfg)
    images, synthetic = load_images(cfg.dataset)
    images = normalize(images, "centered")[: cfg.num_images]
    example = jnp.asarray(pad_to_multiple(images[:1], pad))
    params, restored = load_params(cfg, adapter.model, example)

    # Size the table well past the eval budget: the fitter only fills the
    # entries the data actually reaches, and encode-time indices beyond the
    # table extrapolate by power law (partition.aux_variance_ratio) — but a
    # fitted entry always beats extrapolation, so fit as deep as the data.
    fitter = RatioFitter(RatioFitConfig(kl_per_partition=cfg.kl_per_partition),
                         max_partitions=max(192, cfg.max_partitions))
    key = jax.random.PRNGKey(cfg.seed)
    for i, img in enumerate(images):
        x = jnp.asarray(pad_to_multiple(img[None], pad))
        out = adapter.forward(params, x, jax.random.fold_in(key, i))
        log.info(f"init image {i}: "
                 f"total kl={float(jnp.sum(out['analytic_kl'])):.0f}")
        # Fit on the actual per-group posterior/prior pairs, split into
        # the same equal-size latent blocks the coder uses.
        for n, (p_n, c_n) in enumerate(adapter.pairs(out)):
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
    per-group aux pairs of test images and persist the averaged
    acceptance probabilities."""
    from rec_tpu.coding import RejectionCoder
    from rec_tpu.coding.partition import (plan_split, split_pair,
                                          split_permutation)
    from rec_tpu.coding import rng as crng

    adapter = ModelAdapter(cfg, None)
    pad = pad_multiple_for(cfg)
    images, _ = load_images(cfg.dataset)
    images = normalize(images, "centered")[: cfg.num_images]
    example = jnp.asarray(pad_to_multiple(images[:1], pad))
    params, _ = load_params(cfg, adapter.model, example)

    rc = RejectionCoder(kl_per_partition=cfg.kl_per_partition)
    for i, img in enumerate(images):
        x = jnp.asarray(pad_to_multiple(img[None], pad))
        out = adapter.forward(params, x, jax.random.PRNGKey(cfg.seed + i))
        for n, (p_n, c_n) in enumerate(adapter.pairs(out)):
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


def required_budget(cfg: Config, adapter: ModelAdapter, coder, params, x,
                    seed) -> int:
    """Probe one image's per-group KL and return the partition budget it
    needs (the reference's dynamic ceil(KL/Omega), ref coder.py:501)."""
    out = adapter.forward(params, x, jax.random.PRNGKey(seed))
    need = 1
    for p_n, c_n in adapter.pairs(out):
        need = max(need, coder.required_partitions(p_n, c_n, seed))
    return need


def grow_budget(cfg: Config, log, coder, need: int):
    """Grow the static partition budget to fit a probed requirement
    (25% headroom, ×8 rounding).  A too-small budget silently truncates
    blocks and cascades into a garbage reconstruction."""
    budget = -(-int(need * 1.25) // 8) * 8
    if budget > cfg.max_budget:
        log.warning(
            f"probed requirement {need} exceeds max_budget="
            f"{cfg.max_budget}; capping (over-budget blocks will saturate "
            f"— lossless via the residual stream, but inspect "
            f"saturated_blocks in the CSV)")
        budget = cfg.max_budget
    log.warning(
        f"max_partitions={coder.max_partitions} < required {need}; "
        f"auto-sizing to {budget} (disable with auto_max_partitions=False)")
    return dataclasses.replace(coder, max_partitions=budget)


def main(argv):
    cfg = apply_overrides(Config(), argv)
    log = setup_logger("compression_performance")
    # The checkpoint's recorded training config wins over CLI defaults —
    # a structure-identical mismatch (e.g. laplace-trained params read as
    # discretized_logistic) restores silently and poisons every metric.
    from rec_tpu.train import reconcile_model_config

    if cfg.model == "large_resnet_vae":
        cfg = dataclasses.replace(cfg, large_cfg=reconcile_model_config(
            cfg.model_save_dir, "large_resnet_vae", cfg.large_cfg, log))
    else:
        cfg = dataclasses.replace(cfg, model_cfg=reconcile_model_config(
            cfg.model_save_dir, "resnet_vae", cfg.model_cfg, log))
    print_config(cfg)
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

    pad = pad_multiple_for(cfg)
    images, synthetic = load_images(cfg.dataset)
    if synthetic:
        log.warning("using SYNTHETIC data (no local dataset found)")
    images = normalize(images, "centered")[: cfg.num_images]

    adapter = ModelAdapter(cfg, coder)
    example = jnp.asarray(pad_to_multiple(images[:1], pad))
    params, restored = load_params(cfg, adapter.model, example)
    log.info(f"params restored from checkpoint: {restored}")

    timer = PhaseTimer()
    csv_path = os.path.join(cfg.output_dir, f"{cfg.dataset.dataset}.csv")
    fields = ["index", "width", "height", "seed", "total_kl",
              "ideal_elbo_bpd", "ideal_psnr", "ideal_ms_ssim",
              "latent_code_bits", "file_bits",
              "total_bits_per_dim", "residual_bits", "psnr", "ms_ssim",
              "comp_time", "decomp_time", "roundtrip_ok",
              "saturated_blocks"]
    # Work units: whole images, or (tile > 0) fixed tiles of each image —
    # e.g. tile=256 evaluates a big photo as the 256x256 patches the model
    # was trained on.  A model that is off-distribution at full size shows
    # a heavy-tailed per-block KL (budgets in the thousands); tiling keeps
    # the codec in the trained regime, every tile stays exactly lossless,
    # and per-image totals are aggregated below.
    units = []  # (label, image_idx, unit_array)
    for i, img in enumerate(images):
        if cfg.tile:
            t = cfg.tile
            padded = np.asarray(pad_to_multiple(img[None], t))[0]
            for r in range(0, padded.shape[0], t):
                for c in range(0, padded.shape[1], t):
                    units.append((f"{i}_t{r // t}_{c // t}", i,
                                  padded[r:r + t, c:c + t]))
        else:
            units.append((str(i), i, img))

    rows = []
    crashes = 0
    for u, (label, i, img) in enumerate(units):
        x = jnp.asarray(pad_to_multiple(img[None], pad))
        # Size the static partition budget to the data, like the
        # reference's dynamic ceil(KL/Omega) (ref coder.py:501).  Probing
        # every image catches a later image whose KL exceeds the first
        # image's budget; growth recompiles, shrinkage never does.
        if cfg.auto_max_partitions and (u == 0 or cfg.probe_every_image):
            need = required_budget(cfg, adapter, coder, params, x,
                                   cfg.seed + u)
            if need > coder.max_partitions:
                coder = grow_budget(cfg, log, coder, need)
                adapter = ModelAdapter(cfg, coder)
        try:
            rows.append(_compress_one(cfg, log, adapter, coder, params,
                                      label, cfg.seed + u, img, x, timer))
        except Exception as e:  # per-image catch-and-continue (ref :375-377)
            crashes += 1
            log.error(f"unit {label} failed: {type(e).__name__}: {e}")

    if cfg.tile and rows:
        rows += _aggregate_tiles(cfg, log, rows, images)

    with open(csv_path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        writer.writeheader()
        writer.writerows(rows)
    timer.dump(os.path.join(cfg.output_dir, "phase_times.json"))
    log.info(f"phase times: " + ", ".join(
        f"{k}={v['mean_ms']:.0f}ms" for k, v in timer.report().items()))
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


def _aggregate_tiles(cfg, log, rows, images):
    """One summary CSV row per image from its tiles' rows: bits summed,
    quality metrics dim-weighted (every tile is individually verified
    exactly lossless, so the total is too)."""
    out = []
    for i, img in enumerate(images):
        tr = [r for r in rows if str(r["index"]).startswith(f"{i}_t")]
        if not tr:
            continue
        dims = np.asarray([r["width"] * r["height"] * 3.0 for r in tr])
        bits = sum(r["latent_code_bits"] + r["residual_bits"] for r in tr)
        wmean = lambda k: float(np.sum(
            [r[k] * d for r, d in zip(tr, dims)]) / dims.sum())
        row = dict(index=f"{i}_total", width=img.shape[1],
                   height=img.shape[0], seed=cfg.seed,
                   total_kl=sum(r["total_kl"] for r in tr),
                   ideal_elbo_bpd=wmean("ideal_elbo_bpd"),
                   ideal_psnr=wmean("ideal_psnr"),
                   ideal_ms_ssim=wmean("ideal_ms_ssim"),
                   latent_code_bits=sum(r["latent_code_bits"] for r in tr),
                   file_bits=sum(r["file_bits"] for r in tr),
                   total_bits_per_dim=bits / dims.sum(),
                   residual_bits=sum(r["residual_bits"] for r in tr),
                   psnr=wmean("psnr"), ms_ssim=wmean("ms_ssim"),
                   comp_time=sum(r["comp_time"] for r in tr),
                   decomp_time=sum(r["decomp_time"] for r in tr),
                   roundtrip_ok=all(r["roundtrip_ok"] for r in tr),
                   saturated_blocks=sum(r["saturated_blocks"] for r in tr))
        log.info(f"image {i} TOTAL over {len(tr)} tiles: "
                 f"bpd={row['total_bits_per_dim']:.3f} "
                 f"ideal={row['ideal_elbo_bpd']:.3f} "
                 f"ratio={row['total_bits_per_dim'] / max(row['ideal_elbo_bpd'], 1e-9):.3f} "
                 f"lossless={row['roundtrip_ok']}")
        out.append(row)
    return out


def _compress_one(cfg, log, adapter: ModelAdapter, coder, params, i, seed,
                  img, x, timer: PhaseTimer):
    h, w = x.shape[1:3]
    num_dims = float(np.prod(x.shape[1:]))

    # Ideal pass: ELBO metrics + uncoded-reconstruction quality
    # (ref :321-342 and the ideal_PSNR/ideal_MS_SSIM CSV columns, :280-297).
    with timer.phase("forward"):
        out = adapter.forward(params, x, jax.random.PRNGKey(seed))
        ideal_elbo_bpd = float(
            (-jnp.mean(out["log_likelihood"])
             + jnp.sum(jnp.mean(out["analytic_kl"], axis=1)))
            / (num_dims * LOG2))
    ideal_psnr = float(psnr(x + 0.5, out["reconstruction"])[0])
    ideal_ms = _ms_ssim_auto(x + 0.5, out["reconstruction"])

    t0 = time.time()
    with timer.phase("encode"):
        latents, total_kl, _ = adapter.compress(params, x, seed)
    comp_time = time.time() - t0

    # A block whose count hits the static budget was truncated: its coded
    # sample is a poor posterior approximation, later blocks' priors are
    # conditioned on it and diverge, and the residual stream balloons.
    # Silent truncation reads as "compressed fine" with terrible bpd, so
    # surface it loudly (cf. ref coder.py:226-230, which raises instead).
    saturated = int(sum(np.sum(c == coder.max_partitions)
                        for _, c in latents))
    if saturated:
        log.warning(
            f"image {i}: {saturated} latent block(s) hit "
            f"max_partitions={coder.max_partitions} — the KL budget is too "
            f"small for this model; rerun with a larger max_partitions")

    rec_path = os.path.join(cfg.output_dir, f"img_{i}.rec")
    # Raw index arrays alongside the .rec file (ref :352 saves
    # <image>_block_indices.npy per image for offline analysis).
    np.savez(os.path.join(cfg.output_dir, f"block_indices_{i}.npz"),
             **{f"indices_{g}": ind for g, (ind, _) in enumerate(latents)})
    max_index = (coder.n_samples if cfg.sampler == "beam_search"
                 else 1 << cfg.coding_bits)

    residual = None
    scale = float(jnp.exp(params["params"]["likelihood_log_scale"]))
    if cfg.true_lossless:
        # Score the residual against the decode replay's reconstruction
        # (encoder embeds decoder), then the file alone is lossless.
        from rec_tpu.io.residual import encode_residual

        with timer.phase("residual"):
            dec_recon = adapter.decompress(params, (h, w), latents, seed)
            residual, _ = encode_residual(np.asarray(x[0]) + 0.5,
                                          np.asarray(dec_recon[0]), scale)

    with timer.phase("container_write"):
        nbytes = write_rec(rec_path, seed=seed, image_shape=(h, w, 3),
                           block_size=cfg.block_size, max_index=max_index,
                           latents=latents, residual=residual,
                           codec=cfg.codec)

    # Read back + index round-trip assertion (ref :369-373).
    with timer.phase("container_read"):
        rseed, _, _, latents2, residual2 = read_rec(
            rec_path, max_partitions=coder.max_partitions,
            with_residual=True)
    ok = all(np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
             for a, b in zip(latents, latents2))
    assert ok, "index round trip failed"

    t0 = time.time()
    with timer.phase("decode"):
        recon = adapter.decompress(params, (h, w), latents2, rseed)
        device_fence(recon)
    decomp_time = time.time() - t0

    # Residual bits: actual coded bits when true_lossless, else the
    # reference's implicit -log2 likelihood count (SURVEY.md §0).
    if residual is not None:
        from rec_tpu.io.residual import decode_residual, quantize

        out01 = decode_residual(residual2, np.asarray(recon[0]), scale)
        assert np.array_equal(quantize(out01),
                              quantize(np.asarray(x[0]) + 0.5)), \
            "lossless pixel recovery failed"
        residual_bits = len(residual2.data) * 8.0
    else:
        from rec_tpu.models.likelihoods import discretized_logistic

        residual_bits = float(-discretized_logistic(
            x, recon - 0.5, scale)[0] / LOG2)
    from rec_tpu.coding import CodedLatent

    latent_bits = float(sum(
        jnp.sum(coder.codelength_nats(
            CodedLatent(jnp.asarray(ind), jnp.asarray(cnt), None)))
        for ind, cnt in latents) / LOG2)
    total_bpd = (latent_bits + residual_bits) / num_dims
    p = float(psnr(x + 0.5, recon)[0])

    row = dict(index=i, width=w, height=h, seed=seed,
               total_kl=total_kl,
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
