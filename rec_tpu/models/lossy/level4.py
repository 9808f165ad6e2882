"""Four-level lossy VAE: deep hyperprior ladder with dense skip connectors
between all level pairs in both passes (ref
rec/models/lossy/large_4_level_vae.py:593-993).

Levels 1-2 live at H/16, levels 3-4 at H/64.  Inference combines
progressively-downsampled input/feature skips; the generative pass samples
top-down, each level's posterior stats combined with its synthesized prior
stats through elu + 1x1 convs (ref combine_tensors, :791-798).

The reference's ``compress``/``decompress`` are ``pass`` stubs (ref
:989-993); here they are implemented fully via the REC coder, coding levels
4 -> 3 -> 2 -> 1 against their generative priors.
"""

from __future__ import annotations

from typing import Any, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...coding.gauss import GaussianParams, kl_divergence
from ..modules import GDN
from .transforms import EmpiricalPrior, _down, _up
from .transforms import softplus_scale as _sp


class _Analysis(nn.Module):
    """3x (5,5)/s2+GDN, heads (5,5)/s2; also returns the first conv's
    features (at /2) for the input skip (ref :13-93)."""

    num_filters: int

    @nn.compact
    def __call__(self, x):
        first = GDN(inverse=False, name="gdn_0")(
            _down(self.num_filters, (5, 5), 2, "conv_0")(x))
        t = first
        for i in (1, 2):
            t = GDN(inverse=False, name=f"gdn_{i}")(
                _down(self.num_filters, (5, 5), 2, f"conv_{i}")(t))
        loc = _down(self.num_filters, (5, 5), 2, "posterior_loc_head")(t)
        log_scale = _down(self.num_filters, (5, 5), 2,
                          "posterior_log_scale_head")(t)
        feats = _down(self.num_filters, (5, 5), 2, "features_head")(t)
        return loc, log_scale, feats, first


class _Synthesis(nn.Module):
    """4x (5,5)/s2 up (IGDN between, final -> 3ch) (ref :96-148)."""

    num_filters: int

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = GDN(inverse=True, name=f"igdn_{i}")(
                _up(self.num_filters, (5, 5), 2, f"conv_{i}")(x))
        return _up(3, (5, 5), 2, "conv_3")(x)


class _SameResStack(nn.Module):
    """2x (3,3)/s1 + GDN/IGDN with (3,3)/s1 stat + feature heads — the
    Extended{Analysis,Synthesis} shape (ref :150-283)."""

    num_filters: int
    out_filters: int
    inverse: bool = False
    with_features: bool = True

    @nn.compact
    def __call__(self, x):
        conv = _up if self.inverse else _down
        for i in range(2):
            x = GDN(inverse=self.inverse, name=f"gdn_{i}")(
                conv(self.num_filters, (3, 3), 1, f"conv_{i}")(x))
        loc = conv(self.out_filters, (3, 3), 1, "loc_head")(x)
        log_scale = conv(self.out_filters, (3, 3), 1, "log_scale_head")(x)
        if not self.with_features:
            return loc, log_scale
        feats = conv(self.out_filters, (3, 3), 1, "features_head")(x)
        return loc, log_scale, feats


class _HyperAnalysis(nn.Module):
    """(3,3)/s1+relu, (5,5)/s2+relu, (5,5)/s2 heads (ref :285-348)."""

    num_filters: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(_down(self.num_filters, (3, 3), 1, "conv_0")(x))
        x = jax.nn.relu(_down(self.num_filters, (5, 5), 2, "conv_1")(x))
        loc = _down(self.num_filters, (5, 5), 2, "loc_head")(x)
        log_scale = _down(self.num_filters, (5, 5), 2, "log_scale_head")(x)
        feats = _down(self.num_filters, (5, 5), 2, "features_head")(x)
        return loc, log_scale, feats


class _HyperSynthesis(nn.Module):
    """2x (5,5)/s2 up + relu (no DFT), (3,3) heads (ref :350-414)."""

    num_filters: int
    out_filters: int

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(_up(self.num_filters, (5, 5), 2, "conv_0",
                            dft=False)(x))
        x = jax.nn.relu(_up(self.num_filters, (5, 5), 2, "conv_1",
                            dft=False)(x))
        loc = _up(self.out_filters, (3, 3), 1, "loc_head", dft=False)(x)
        log_scale = _up(self.out_filters, (3, 3), 1, "log_scale_head",
                        dft=False)(x)
        feats = _up(self.out_filters, (3, 3), 1, "features_head",
                    dft=False)(x)
        return loc, log_scale, feats


class _Combiner(nn.Module):
    features: int

    @nn.compact
    def __call__(self, *tensors):
        return nn.Conv(self.features, (1, 1))(
            jax.nn.elu(jnp.concatenate(tensors, axis=-1)))


class Large4LevelVAE(nn.Module):
    level_1_filters: int = 192
    level_2_filters: int = 192
    level_3_filters: int = 128
    level_4_filters: int = 128
    coder: Any = None

    def setup(self):
        f1, f2, f3, f4 = (self.level_1_filters, self.level_2_filters,
                          self.level_3_filters, self.level_4_filters)
        self.analysis = _Analysis(f1)
        self.synthesis = _Synthesis(f1)
        self.ext_analysis = _SameResStack(f2, f2, inverse=False)
        self.ext_synthesis = _SameResStack(f2, f1, inverse=True)
        self.hyper_analysis = _HyperAnalysis(f3)
        self.hyper_synthesis = _HyperSynthesis(f3, f2)
        self.ext_hyper_analysis = _SameResStack(f4, f4, inverse=False,
                                                with_features=False)
        self.ext_hyper_synthesis = _SameResStack(f4, f3, inverse=True)
        self.hyper_prior = EmpiricalPrior(f4, return_features=True)

        self.in_to_1 = _down(f1, (9, 9), 8, "inputs_to_level_1_connector")
        self.in_to_2 = nn.Conv(f2, (1, 1), name="inputs_to_level_2_connector")
        self.c1_to_2 = nn.Conv(f2, (1, 1), name="level_1_to_level_2_connector")
        self.in_to_3 = _down(f3, (5, 5), 4, "inputs_to_level_3_connector")
        self.c1_to_3 = _down(f3, (5, 5), 4, "level_1_to_level_3_connector")
        self.c2_to_3 = _down(f3, (5, 5), 4, "level_2_to_level_3_connector")
        self.infer_combiners = [_Combiner(f, name=f"infer_combiner_{i+1}")
                                for i, f in enumerate((f1, f2, f3))]

        self.g4_to_3 = nn.Conv(f3, (1, 1), name="level_4_to_level_3_connector")
        self.g4_to_2 = _up(f2, (5, 5), 4, "level_4_to_level_2_connector")
        self.g4_to_1 = _up(f1, (5, 5), 4, "level_4_to_level_1_connector")
        self.g3_to_2 = _up(f2, (5, 5), 4, "level_3_to_level_2_connector")
        self.g3_to_1 = _up(f1, (5, 5), 4, "level_3_to_level_1_connector")
        self.g2_to_1 = nn.Conv(f1, (1, 1), name="level_2_to_level_1_connector")
        self.gen_combiners = [_Combiner(f, name=f"gen_combiner_{i+1}")
                              for i, f in enumerate((f1, f2, f3, f4))]
        self.post_loc_combiners = [
            _Combiner(f, name=f"post_loc_combiner_{i+1}")
            for i, f in enumerate((f1, f2, f3, f4))]
        self.post_log_scale_combiners = [
            _Combiner(f, name=f"post_log_scale_combiner_{i+1}")
            for i, f in enumerate((f1, f2, f3, f4))]

    # -- inference side ---------------------------------------------------

    def _inference_stats(self, x):
        loc1, ls1, feat1, first = self.analysis(x)
        res1 = self.in_to_1(first)
        t = self.infer_combiners[0](res1, feat1)
        loc2, ls2, feat2 = self.ext_analysis(t)
        t = self.infer_combiners[1](self.in_to_2(res1), self.c1_to_2(feat1),
                                    feat2)
        loc3, ls3, feat3 = self.hyper_analysis(t)
        t = self.infer_combiners[2](self.in_to_3(res1), self.c1_to_3(feat1),
                                    self.c2_to_3(feat2), feat3)
        loc4, ls4 = self.ext_hyper_analysis(t)
        return [(loc1, ls1), (loc2, ls2), (loc3, ls3), (loc4, ls4)]

    # -- generative ladder ------------------------------------------------

    def _ladder(self, batch, height, width, infer_stats, sample_fn):
        """Top-down pass; ``sample_fn(level_idx, post, prior)`` returns the
        latent (and stashes codes).  level_idx is 4,3,2,1.  ``infer_stats``
        is None for pure decode."""
        outs = {"kls": []}

        def dists(level, p_loc, p_ls):
            prior = GaussianParams(p_loc, _sp(p_ls))
            if infer_stats is None:
                return None, prior
            q_loc, q_ls = infer_stats[level - 1]
            loc = self.post_loc_combiners[level - 1](p_loc, q_loc)
            ls = self.post_log_scale_combiners[level - 1](p_ls, q_ls)
            post = GaussianParams(loc, _sp(ls))
            outs["kls"].append(jnp.mean(jnp.sum(
                kl_divergence(post, prior), axis=(1, 2, 3))))
            return post, prior

        p_loc4, p_ls4, gfeat4 = self.hyper_prior(batch, height // 64,
                                                 width // 64)
        post4, prior4 = dists(4, p_loc4, p_ls4)
        z4 = sample_fn(4, post4, prior4)
        t = self.gen_combiners[3](z4, gfeat4)

        p_loc3, p_ls3, gfeat3 = self.ext_hyper_synthesis(t)
        post3, prior3 = dists(3, p_loc3, p_ls3)
        z3 = sample_fn(3, post3, prior3)
        t = self.gen_combiners[2](z3, gfeat3, self.g4_to_3(gfeat4))

        p_loc2, p_ls2, gfeat2 = self.hyper_synthesis(t)
        post2, prior2 = dists(2, p_loc2, p_ls2)
        z2 = sample_fn(2, post2, prior2)
        t = self.gen_combiners[1](z2, gfeat2, self.g4_to_2(gfeat4),
                                  self.g3_to_2(gfeat3))

        p_loc1, p_ls1, gfeat1 = self.ext_synthesis(t)
        post1, prior1 = dists(1, p_loc1, p_ls1)
        z1 = sample_fn(1, post1, prior1)
        t = self.gen_combiners[0](z1, gfeat1, self.g4_to_1(gfeat4),
                                  self.g3_to_1(gfeat3), self.g2_to_1(gfeat2))

        outs["reconstruction"] = self.synthesis(t)
        return outs

    def __call__(self, images, key):
        B, H, W, _ = images.shape
        infer_stats = self._inference_stats(images)
        keys = jax.random.split(key, 4)

        def sample_fn(level, post, prior):
            return post.sample(keys[level - 1])

        outs = self._ladder(B, H, W, infer_stats, sample_fn)
        return {"reconstruction": outs["reconstruction"],
                "kls": outs["kls"]}

    def rec_forward(self, images, seed):
        """Full REC compression — implements what the reference stubs
        (ref large_4_level_vae.py:989-990)."""
        B, H, W, _ = images.shape
        assert B == 1, "rec_forward expects batch size 1"
        infer_stats = self._inference_stats(images)
        codes = {}

        def sample_fn(level, post, prior):
            post1 = GaussianParams(post.loc[0], post.scale[0])
            prior1 = GaussianParams(prior.loc[0], prior.scale[0])
            coded = self.coder.encode(post1, prior1, seed + (4 - level))
            codes[level] = (coded.indices, coded.counts)
            return coded.sample[None]

        outs = self._ladder(B, H, W, infer_stats, sample_fn)
        return {"reconstruction": outs["reconstruction"],
                "latents": [codes[l] for l in (4, 3, 2, 1)],
                "kls": outs["kls"]}

    def rec_decode(self, shape, latents, seed):
        H, W = shape
        per_level = {4 - i: lat for i, lat in enumerate(latents)}

        def sample_fn(level, post, prior):
            ind, cnt = per_level[level]
            prior1 = GaussianParams(prior.loc[0], prior.scale[0])
            return self.coder.decode(prior1, ind, cnt,
                                     seed + (4 - level))[None]

        outs = self._ladder(1, H, W, None, sample_fn)
        return outs["reconstruction"]
