"""Custom NN modules (L0), re-designed as Flax Linen modules.

Parity targets (SURVEY.md §2.4):
  * ``ReparameterizedConv2D`` / ``ReparameterizedConv2DTranspose`` — weight-norm
    convs with data-dependent init (ref
    rec/models/custom_modules/reparameterized_convolutions.py:237-256).
    DDI exploits Linen's init-with-real-inputs: the log-scale/bias params are
    initialized from the *normalized-kernel* conv output's batch statistics
    captured in an initializer closure.  Deviation from the reference, by
    design: we set log_scale = log(init_scale/std) exactly (the principled
    Salimans & Kingma weight-norm init) instead of the reference's /3.0
    softening (ref :251), and transpose convs normalize over the true
    input axes instead of replicating the IAF-repo axis quirk (ref :544-548).
  * autoregressive masks "a"/"b" (PixelCNN convention; ref :27-53) and
    ``AutoRegressiveMultiConv2D`` (ref :635-675).
  * ``GDN`` — Ballé generalized divisive normalization with the lower-bound
    clamp implemented as a jax.custom_vjp (ref custom_modules/gdn.py).
  * ``SignalConv2D`` — tensorflow/compression-style signal conv: corr/conv
    kernel flip, down/up sampling, reflect padding, RDFT kernel
    parametrization (ref custom_modules/signal_convolution.py).  Upsampling
    uses ``lax.conv_general_dilated`` with lhs_dilation (the XLA-native
    transposed conv) instead of conv2d_backprop_input.

All modules are NHWC, f32 params; activations may run in bf16 upstream.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Autoregressive masks (ref reparameterized_convolutions.py:27-53)
# ---------------------------------------------------------------------------

def linear_ar_mask(n_in: int, n_out: int, zerodiagonal: bool = False) -> np.ndarray:
    assert n_in % n_out == 0 or n_out % n_in == 0, (n_in, n_out)
    mask = np.ones([n_in, n_out], dtype=np.float32)
    if n_out >= n_in:
        k = n_out // n_in
        for i in range(n_in):
            mask[i + 1:, i * k:(i + 1) * k] = 0
            if zerodiagonal:
                mask[i:i + 1, i * k:(i + 1) * k] = 0
    else:
        k = n_in // n_out
        for i in range(n_out):
            mask[(i + 1) * k:, i:i + 1] = 0
            if zerodiagonal:
                mask[i * k:(i + 1) * k, i:i + 1] = 0
    return mask


def conv_ar_mask(h: int, w: int, n_in: int, n_out: int,
                 zerodiagonal: bool = False) -> np.ndarray:
    """HWIO mask; "a" = zerodiagonal (strictly causal), "b" = includes self."""
    l, m = (h - 1) // 2, (w - 1) // 2
    mask = np.ones([h, w, n_in, n_out], dtype=np.float32)
    mask[:l] = 0
    mask[l, :m] = 0
    mask[l, m] = linear_ar_mask(n_in, n_out, zerodiagonal)
    return mask


# ---------------------------------------------------------------------------
# Weight-normalized convolutions with data-dependent init
# ---------------------------------------------------------------------------

def _l2_normalize(v, axes, eps=1e-12):
    return v * jax.lax.rsqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True) + eps)


class ReparameterizedConv2D(nn.Module):
    """Weight-norm conv: kernel = l2_normalize(v) * exp(log_scale), with
    data-dependent init of (log_scale, bias) from the first batch."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    init_scale: float = 0.1
    mask: Optional[str] = None  # None | "a" | "b"

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kshape = self.kernel_size + (in_ch, self.features)
        v = self.param("v", nn.initializers.normal(0.05), kshape)
        vn = _l2_normalize(v, (0, 1, 2))
        if self.mask is not None:
            vn = vn * conv_ar_mask(*self.kernel_size, in_ch, self.features,
                                   zerodiagonal=(self.mask == "a"))

        out = jax.lax.conv_general_dilated(
            x, vn, window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        # Data-dependent init: closures capture the normalized-kernel output.
        # The log-scale is clamped to +-4.6 (kernel gain within [1e-2, 1e2]):
        # a layer whose init input is degenerate (e.g. the all-zero h_top
        # generative base) has out-variance ~0 and would otherwise get a
        # ~1e4x amplifier that detonates training at the first nonzero input.
        def log_scale_init(_):
            var = jnp.var(out, axis=(0, 1, 2))
            return jnp.clip(
                jnp.log(self.init_scale * jax.lax.rsqrt(var + 1e-10)),
                -4.6, 4.6)

        log_scale = self.param("log_scale", log_scale_init)
        out = out * jnp.exp(log_scale)
        if self.use_bias:
            def bias_init(_):
                mean = jnp.mean(out, axis=(0, 1, 2))
                return -jax.lax.stop_gradient(mean)

            out = out + self.param("bias", bias_init)
        return out


class ReparameterizedConv2DTranspose(nn.Module):
    """Weight-norm transposed conv (ref :400-598); used for the RVAE's final
    upsampling layer."""

    features: int
    kernel_size: Tuple[int, int] = (5, 5)
    strides: Tuple[int, int] = (2, 2)
    use_bias: bool = True
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # HWIO with I=input (lax.conv_transpose convention)
        kshape = self.kernel_size + (in_ch, self.features)
        v = self.param("v", nn.initializers.normal(0.05), kshape)
        vn = _l2_normalize(v, (0, 1, 2))

        out = jax.lax.conv_transpose(
            x, vn, strides=self.strides, padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

        def log_scale_init(_):
            var = jnp.var(out, axis=(0, 1, 2))
            return jnp.clip(
                jnp.log(self.init_scale * jax.lax.rsqrt(var + 1e-10)),
                -4.6, 4.6)

        log_scale = self.param("log_scale", log_scale_init)
        out = out * jnp.exp(log_scale)
        if self.use_bias:
            def bias_init(_):
                return -jax.lax.stop_gradient(jnp.mean(out, axis=(0, 1, 2)))

            out = out + self.param("bias", bias_init)
        return out


class AutoRegressiveMultiConv2D(nn.Module):
    """Masked multi-conv with context injection and multiple heads, for IAF
    posteriors (ref :635-675)."""

    convolution_features: Sequence[int]
    head_features: Sequence[int]
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, context):
        for i, feats in enumerate(self.convolution_features):
            x = ReparameterizedConv2D(features=feats,
                                      kernel_size=self.kernel_size,
                                      mask="b", name=f"conv_{i}")(x)
            if i == 0:
                x = x + context
            x = jax.nn.elu(x)
        return [ReparameterizedConv2D(features=feats,
                                      kernel_size=self.kernel_size,
                                      mask="a", name=f"head_{i}")(x)
                for i, feats in enumerate(self.head_features)]


# ---------------------------------------------------------------------------
# GDN (ref custom_modules/gdn.py)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


class GDN(nn.Module):
    """Generalized divisive normalization: y = x * (beta + gamma * x^2)^(-+1/2)
    with reparameterized beta/gamma clamped through ``lower_bound``."""

    inverse: bool = False
    gamma_init: float = 0.1
    beta_minimum: float = 1e-6
    gamma_minimum: float = 0.0
    reparam_offset: float = 2.0 ** -18

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        pedestal = self.reparam_offset ** 2
        beta_bound = (self.beta_minimum + pedestal) ** 0.5
        gamma_bound = (self.gamma_minimum + pedestal) ** 0.5

        beta_r = self.param(
            "beta_reparam",
            lambda _: jnp.sqrt(jnp.ones((C,)) + pedestal))
        gamma_r = self.param(
            "gamma_reparam",
            lambda _: jnp.sqrt(self.gamma_init * jnp.eye(C) + pedestal))

        beta = jnp.square(lower_bound(beta_r, beta_bound)) - pedestal
        gamma = jnp.square(lower_bound(gamma_r, gamma_bound)) - pedestal

        # 1x1 conv of x^2 with gamma as (C_in, C_out) — one MXU matmul.
        norm = jnp.einsum("nhwc,cd->nhwd", jnp.square(x), gamma,
                          preferred_element_type=jnp.float32) + beta
        norm = jnp.sqrt(norm) if self.inverse else jax.lax.rsqrt(norm)
        return x * norm


# ---------------------------------------------------------------------------
# SignalConv2D (ref custom_modules/signal_convolution.py)
# ---------------------------------------------------------------------------

def irdft_matrix(shape: Tuple[int, int]) -> np.ndarray:
    """Orthonormal inverse-RDFT basis over the kernel support (ref
    signal_convolution.py:248-268; same construction via numpy's rfft)."""
    from scipy.fftpack import rfft

    size = int(np.prod(shape))
    rank = len(shape)
    matrix = np.identity(size, dtype=np.float64).reshape((size,) + tuple(shape))
    for axis in range(rank):
        matrix = rfft(matrix, axis=axis + 1)
        slices = [slice(None)] * (rank + 1)
        slices[axis + 1] = slice(1, None) if shape[axis] % 2 == 1 else slice(1, -1)
        matrix[tuple(slices)] *= np.sqrt(2)
    matrix /= np.sqrt(size)
    return matrix.reshape((size, size)).astype(np.float32)


def same_padding_for_kernel(shape, corr: bool, strides_up=None):
    """(ref signal_convolution.py:271-284)"""
    rank = len(shape)
    if strides_up is None:
        strides_up = rank * (1,)
    if corr:
        padding = [(s // 2, (s - 1) // 2) for s in shape]
    else:
        padding = [((s - 1) // 2, s // 2) for s in shape]
    return [((padding[i][0] - 1) // strides_up[i] + 1,
             (padding[i][1] - 1) // strides_up[i] + 1) for i in range(rank)]


class SignalConv2D(nn.Module):
    """Ballé-style signal-processing conv: correlation/convolution flip,
    integer up/down-sampling, reflect padding, RDFT kernel parametrization."""

    features: int
    kernel: Tuple[int, int] = (5, 5)
    corr: bool = False
    strides_down: int = 1
    strides_up: int = 1
    padding: str = "reflect"  # "reflect" | "zeros"
    use_bias: bool = True
    dft_parametrization: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel
        use_dft = self.dft_parametrization and self.kernel != (1, 1)

        if use_dft:
            size = kh * kw
            basis = irdft_matrix(self.kernel)

            def kernel_init(key):
                init = nn.initializers.variance_scaling(
                    1.0, "fan_avg", "uniform")(key, (kh, kw, in_ch, self.features))
                return basis.T @ init.reshape(size, -1)

            weights = self.param("kernel_rdft", kernel_init)
            kernel = (basis @ weights).reshape(kh, kw, in_ch, self.features)
        else:
            kernel = self.param(
                "kernel", nn.initializers.variance_scaling(1.0, "fan_avg",
                                                           "uniform"),
                (kh, kw, in_ch, self.features))

        corr = self.corr
        # Flip so that the cheap path (correlation) implements both modes
        # (ref signal_convolution.py:195-205).
        if not corr and self.strides_up == 1:
            corr = True
            kernel = kernel[::-1, ::-1]
        elif corr and self.strides_up != 1:
            corr = False
            kernel = kernel[::-1, ::-1]

        pad = same_padding_for_kernel(self.kernel, corr,
                                      (self.strides_up, self.strides_up))

        if self.padding == "reflect":
            x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)), mode="reflect")
            conv_pad = [(0, 0), (0, 0)]
            prepad = pad
        else:
            conv_pad = list(pad)
            prepad = [(0, 0), (0, 0)]

        if self.strides_up == 1:
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(self.strides_down, self.strides_down),
                padding=conv_pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            # Up-sampling: lhs-dilated convolution (XLA-native transposed
            # conv; replaces ref conv2d_backprop_input, :147-186).  The
            # spatial flip makes it a true convolution of the dilated input.
            # Output length replicates the reference's extra_pad_end=True
            # deconv arithmetic: L_out = L_pre*up + (k-1) - (p_lo + p_hi)
            # with p = prepad*up + same-padding offsets; in dilated-conv
            # terms that is padding (k-1-p_lo, k-1-p_hi + up-1) around the
            # (L-1)*up+1 dilated samples (negative values crop).
            up = self.strides_up
            pads = []
            for i in range(2):
                k = self.kernel[i]
                p_lo = prepad[i][0] * up + k // 2
                p_hi = prepad[i][1] * up + (k - 1) // 2
                pads.append((k - 1 - p_lo, k - 1 - p_hi + up - 1))
            out = jax.lax.conv_general_dilated(
                x, kernel[::-1, ::-1],
                window_strides=(1, 1),
                padding=pads,
                lhs_dilation=(up, up),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.strides_down > 1:
                out = out[:, ::self.strides_down, ::self.strides_down]

        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.features,))
        return out
