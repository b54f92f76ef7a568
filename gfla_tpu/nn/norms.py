"""Normalization / activation / conv factories (flax.linen, NHWC).

Mirrors the reference factory surface (model/networks/base_function.py:175-208,
264-277): norm types batch/instance/adain/spade/none, activations
ReLU/SELU/LeakyReLU(0.1)/PReLU, optional spectral normalization, optional
CoordConv. All convs are NHWC; spectral-norm power-iteration state lives in
the 'batch_stats' collection (updated once per optimization step when
``update_stats=True`` is threaded through, approximating torch's
per-forward update).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


Activation = Callable[[jax.Array], jax.Array]


def get_activation(name: str) -> Activation:
    """Activation factory (reference base_function.py:196-208)."""
    if name == "ReLU":
        return jax.nn.relu
    if name == "SELU":
        return jax.nn.selu
    if name == "LeakyReLU":
        fn = lambda x: jax.nn.leaky_relu(x, 0.1)
        fn.__gfla_leaky01__ = True  # lets the fused Pallas attention engage
        return fn
    if name == "PReLU":
        # Live configs never use PReLU; the torch original is a *learnable*
        # per-channel slope, which a fixed leaky_relu would silently
        # mistrain — refuse instead (like the norm factory does for
        # adain/spade).
        raise NotImplementedError(
            "activation [PReLU] has learnable slopes and is not implemented"
        )
    raise NotImplementedError(f"activation [{name}] is not found")


class InstanceNorm(nn.Module):
    """InstanceNorm2d with affine params (torch semantics: eps=1e-5, no
    running stats — per-example, hence shard-safe under data parallelism)."""

    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return y * scale + bias


class Norm(nn.Module):
    """String-dispatched norm layer. 'none' is handled by callers (no layer)."""

    norm_type: str  # batch | instance

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        if self.norm_type == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
        if self.norm_type == "instance":
            return InstanceNorm()(x)
        raise NotImplementedError(f"normalization layer [{self.norm_type}] not found")


def _maybe_spectral(layer: nn.Module, use_spect: bool) -> nn.Module:
    if use_spect:
        return nn.SpectralNorm(layer, error_on_non_matrix=False)
    return layer


_ORTHO = nn.initializers.orthogonal(scale=0.02)


def default_kernel_init() -> Callable:
    """Orthogonal(gain=0.02) — the reference's default init
    (base_network.py:29-53 with init_type='orthogonal')."""
    return _ORTHO


class Conv2d(nn.Module):
    """NHWC conv with torch-style explicit padding + optional spectral norm
    and optional CoordConv channels (reference base_function.py:272-332)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    use_spect: bool = False
    use_coord: bool = False
    with_r: bool = False
    pad_mode: str = "zeros"  # zeros | reflect

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        if self.use_coord:
            x = add_coords(x, self.with_r)
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if self.pad_mode == "reflect" and (pad[0] or pad[1]):
            x = jnp.pad(
                x,
                ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)),
                mode="reflect",
            )
            conv_pad = ((0, 0), (0, 0))
        else:
            conv_pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=conv_pad,
            use_bias=self.use_bias,
            kernel_init=default_kernel_init(),
        )
        if self.use_spect:
            return nn.SpectralNorm(conv, error_on_non_matrix=False)(
                x, update_stats=update_stats
            )
        return conv(x)


class ConvTranspose2x(nn.Module):
    """Exact 2× spatial upsampling transposed conv.

    Matches torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) output
    arithmetic: H → 2H. Implemented as input-dilated conv (lhs_dilation=2,
    pad (1,2), flipped kernel) — the canonical XLA formulation.
    """

    features: int
    use_spect: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        conv = nn.ConvTranspose(
            self.features,
            (3, 3),
            strides=(2, 2),
            padding=((1, 2), (1, 2)),
            kernel_init=default_kernel_init(),
        )
        if self.use_spect:
            return nn.SpectralNorm(conv, error_on_non_matrix=False)(
                x, update_stats=update_stats
            )
        return conv(x)


class Conv3d(nn.Module):
    """NDHWC 3-D conv (for the temporal discriminator), torch-style padding."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    use_spect: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = True) -> jax.Array:
        p = self.padding
        conv = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=((p[0], p[0]), (p[1], p[1]), (p[2], p[2])),
            kernel_init=default_kernel_init(),
        )
        if self.use_spect:
            return nn.SpectralNorm(conv, error_on_non_matrix=False)(
                x, update_stats=update_stats
            )
        return conv(x)


def add_coords(x: jax.Array, with_r: bool = False) -> jax.Array:
    """Append normalized coordinate channels (reference AddCoords,
    base_function.py:283-313; note the reference normalizes its 'xx' channel
    over the H axis and 'yy' over W — we reproduce that orientation)."""
    B, H, W, _ = x.shape
    hh = jnp.linspace(-1.0, 1.0, H, dtype=x.dtype)
    ww = jnp.linspace(-1.0, 1.0, W, dtype=x.dtype)
    hh_ch = jnp.broadcast_to(hh[None, :, None, None], (B, H, W, 1))
    ww_ch = jnp.broadcast_to(ww[None, None, :, None], (B, H, W, 1))
    out = jnp.concatenate([x, hh_ch, ww_ch], axis=-1)
    if with_r:
        rr = jnp.sqrt(hh_ch**2 + ww_ch**2)
        out = jnp.concatenate([out, rr], axis=-1)
    return out
