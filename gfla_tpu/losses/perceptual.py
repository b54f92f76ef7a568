"""VGG-based perceptual losses: content/style and sampling correctness.

Capability parity with the reference VGGLoss / StyleLoss / PerceptualLoss /
PerceptualCorrectness (model/networks/external_function.py:121-319).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from gfla_tpu.models.vgg import vgg19_features
from gfla_tpu.ops.gaussian_resample import gaussian_resample

_EPS = 1e-8

# layer name per attention level index (external_function.py:228; the
# reference's 'rel1_1' typo would KeyError — fixed here)
CORRECTNESS_LAYERS = ["relu1_1", "relu2_1", "relu3_1", "relu4_1"]

CONTENT_LAYERS = ["relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"]
STYLE_LAYERS = ["relu2_2", "relu3_4", "relu4_4", "relu5_2"]


def _acc(x: jax.Array):
    """Accumulation dtype: fp32 for low-precision inputs, but preserves
    float64 under x64 (parity tests run the whole stack in f64)."""
    return jnp.promote_types(x.dtype, jnp.float32)


def l1_loss(a: jax.Array, b: jax.Array) -> jax.Array:
    dt = jnp.promote_types(_acc(a), _acc(b))
    return jnp.mean(jnp.abs(a.astype(dt) - b.astype(dt)))


def gram_matrix(x: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, C, C), normalized by h·w·c
    (external_function.py:134-139)."""
    B, H, W, C = x.shape
    f = x.reshape(B, H * W, C)
    return jnp.einsum("bnc,bnd->bcd", f, f,
                      preferred_element_type=_acc(x)) / (H * W * C)


def vgg_content_style_loss(vgg_params, x: jax.Array, y: jax.Array,
                           weights: Sequence[float] = (1.0,) * 5,
                           fx=None, fy=None):
    """Returns (content_loss, style_loss) (external_function.py:121-160).
    Inputs in [-1, 1]; fed to VGG19 unnormalized, as the reference does.
    Precomputed feature dicts can be passed to dedupe VGG forwards."""
    fx = fx if fx is not None else vgg19_features(vgg_params, x)
    fy = fy if fy is not None else vgg19_features(vgg_params, y)
    content = 0.0
    for w, name in zip(weights, CONTENT_LAYERS):
        content = content + w * l1_loss(fx[name], fy[name])
    style = 0.0
    for name in STYLE_LAYERS:
        style = style + l1_loss(gram_matrix(fx[name]), gram_matrix(fy[name]))
    return content, style


def _max_corr_fwd_scan(source_norm, target_norm, chunk):
    """Running (max, argmax) of <s_i, t_j> over source chunks.
    Returns (cmax (B, Nt), argmax (B, Nt) int32 into the source axis).

    With GFLA_PALLAS_CORR=1 (fp32 path only) the chunked XLA scan is
    replaced by the Pallas flash-max kernel (ops/pallas_corr.py): the N²
    correlation stays in VMEM instead of round-tripping chunk tiles
    through HBM."""
    B, Ns, C = source_norm.shape
    Nt = target_norm.shape[1]
    acc = _acc(source_norm)
    if os.environ.get("GFLA_PALLAS_CORR", "0") == "1" and acc == jnp.float32:
        from gfla_tpu.ops.pallas_corr import max_corr_pallas

        interpret = jax.default_backend() != "tpu"
        return max_corr_pallas(source_norm, target_norm, interpret=interpret)

    def one(corr, base):
        # corr: (B, cs, Nt) — per-chunk max + global source index
        m = jnp.max(corr, axis=1)
        a = jnp.argmax(corr, axis=1).astype(jnp.int32) + base
        return m, a

    if Ns <= chunk:
        corr = jnp.einsum("bsc,btc->bst", source_norm, target_norm,
                          preferred_element_type=acc)
        return one(corr, 0)

    pad = (-Ns) % chunk
    s = jnp.pad(source_norm, ((0, 0), (0, pad), (0, 0)))
    valid = jnp.pad(jnp.ones((Ns,), acc), (0, pad))
    n_chunks = s.shape[1] // chunk
    s = s.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)
    valid = valid.reshape(n_chunks, chunk)

    def body(carry, xs):
        cmax, camx = carry
        s_chunk, v, base = xs  # (B, chunk, C), (chunk,), ()
        corr = jnp.einsum("bsc,btc->bst", s_chunk, target_norm,
                          preferred_element_type=acc)
        corr = jnp.where(v[None, :, None] > 0, corr, -jnp.inf)
        m, a = one(corr, base)
        take = m > cmax
        return (jnp.where(take, m, cmax), jnp.where(take, a, camx)), None

    init = (jnp.full((B, Nt), -jnp.inf, acc),
            jnp.zeros((B, Nt), jnp.int32))
    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    (cmax, amax), _ = jax.lax.scan(body, init, (s, valid, bases))
    return cmax, amax


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _chunked_max_correlation(
    source_norm: jax.Array, target_norm: jax.Array, chunk: int = 2048
) -> jax.Array:
    """max over source positions of <s_i, t_j>: (B, Ns, C)·(B, Nt, C) → (B, Nt).

    The reference materializes the full (Ns, Nt) correlation
    (external_function.py:263) — O(N²) memory. We scan source chunks with a
    running max so peak memory is O(chunk·Nt) while each chunk is one MXU
    matmul.

    Custom VJP: autodiff of max-of-matmul would re-materialize the O(N²)
    correlation (as an eq-mask times cotangent, then two N²-sized matmuls).
    But d cmax_j / d s_i is nonzero only at i = argmax_j, so the backward is
    one gather (for grad target) + one scatter-add (for grad source) —
    O(N·C) bytes instead of O(N²). On the 256² pose config this removes
    ~½ GB of HBM traffic per correctness layer per step.
    """
    return _max_corr_fwd_scan(source_norm, target_norm, chunk)[0]


def _max_corr_fwd(source_norm, target_norm, chunk):
    cmax, amax = _max_corr_fwd_scan(source_norm, target_norm, chunk)
    return cmax, (source_norm, target_norm, amax)


def _max_corr_bwd(chunk, res, g):
    source_norm, target_norm, amax = res
    acc = _acc(source_norm)
    g = g.astype(acc)
    # cmax_j = <s[amax_j], t_j>
    s_at = jnp.take_along_axis(source_norm, amax[..., None], axis=1)
    dt = (g[..., None] * s_at.astype(acc)).astype(target_norm.dtype)
    contrib = g[..., None] * target_norm.astype(acc)          # (B, Nt, C)
    ds = jnp.zeros(source_norm.shape, acc).at[
        jnp.arange(source_norm.shape[0])[:, None], amax
    ].add(contrib).astype(source_norm.dtype)
    return ds, dt


_chunked_max_correlation.defvjp(_max_corr_fwd, _max_corr_bwd)


def _safe_norm(x: jax.Array, axis: int) -> jax.Array:
    """L2 norm with torch's zero-subgradient convention. jnp.linalg.norm has
    a NaN gradient at exactly-zero vectors — which occur whenever a
    zero-padded bilinear warp lands fully off-image (early training with
    wild flows), or a ReLU feature vector is all-zero. The max() guard
    zeroes the gradient there instead (value impact ≤ 1e-15)."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, 1e-30))


def _nearest_resize(x: jax.Array, H: int, W: int) -> jax.Array:
    """torch F.interpolate(mode='nearest') semantics: src index =
    floor(dst_index · in/out). jax.image.resize's nearest is center-aligned
    and picks different pixels — not faithful."""
    B, h, w, C = x.shape
    iy = jnp.floor(jnp.arange(H) * (h / H)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(W) * (w / W)).astype(jnp.int32)
    return x[:, iy][:, :, ix]


def _bilinear_warp(source: jax.Array, flow: jax.Array) -> jax.Array:
    """Plain bilinear warp used by the `use_bilinear_sampling` path
    (external_function.py:309-319). Zero-padding outside (grid_sample
    default), unlike the Gaussian path's edge clamp.

    The reference normalizes the grid by (size-1) but scales the flow by
    2/size before grid_sample(align_corners=True) — the effective pixel
    displacement is flow·(size-1)/size, reproduced here exactly (verified
    against a torch grid_sample oracle in tests/test_torch_parity.py)."""
    B, H, W, C = source.shape
    ys = jnp.arange(H, dtype=flow.dtype)
    xs = jnp.arange(W, dtype=flow.dtype)
    dy = flow[..., 1] * ((H - 1) / H) + ys[None, :, None]
    dx = flow[..., 0] * ((W - 1) / W) + xs[None, None, :]
    fy, fx = jnp.floor(dy), jnp.floor(dx)
    wy, wx = dy - fy, dx - fx
    iy0, ix0 = fy.astype(jnp.int32), fx.astype(jnp.int32)
    src = source.reshape(B, H * W, C)

    def tap(iy, ix):
        inb = ((iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)).astype(source.dtype)
        flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        vals = jnp.take_along_axis(
            src, flat.reshape(B, H * W, 1), axis=1
        ).reshape(B, H, W, C)
        return vals * inb[..., None]

    out = (
        (1 - wy)[..., None] * (1 - wx)[..., None] * tap(iy0, ix0)
        + (1 - wy)[..., None] * wx[..., None] * tap(iy0, ix0 + 1)
        + wy[..., None] * (1 - wx)[..., None] * tap(iy0 + 1, ix0)
        + wy[..., None] * wx[..., None] * tap(iy0 + 1, ix0 + 1)
    )
    return out


class PerceptualCorrectness:
    """Sampling-correctness loss (external_function.py:223-307).

    For each flow field (coarse→fine) and its VGG layer: warp the source
    features with the Gaussian resampler (k=4, dil=1, σ=2), compare the
    cosine similarity of warped-source vs target features against the
    per-position maximum correlation over *all* source positions, and
    penalize exp(-cs/(cmax+ε)).
    """

    def __init__(self, vgg_params, layers: Sequence[str] = tuple(CORRECTNESS_LAYERS)):
        self.vgg_params = vgg_params
        self.layers = list(layers)

    def __call__(
        self,
        target: jax.Array,
        source: jax.Array,
        flow_list: Sequence[jax.Array],
        used_layers: Sequence[int],
        mask: Optional[jax.Array] = None,
        use_bilinear_sampling: bool = False,
        target_feats=None,
        source_feats=None,
        frames: Optional[int] = None,
    ) -> jax.Array:
        """With `frames=T`, inputs are temporally folded batches
        (B·T, ...) in (b, t) order and the reduction is done per frame then
        summed — exactly the reference's per-frame loop
        (dance_model.py:405-418) as ONE batched VGG forward per image set."""
        used = sorted(used_layers, reverse=True)
        t_feats = target_feats if target_feats is not None else \
            vgg19_features(self.vgg_params, target)
        s_feats = source_feats if source_feats is not None else \
            vgg19_features(self.vgg_params, source)
        loss = 0.0
        for i, flow in enumerate(flow_list):
            loss = loss + self._layer_loss(
                t_feats[self.layers[used[i]]],
                s_feats[self.layers[used[i]]],
                flow, mask, use_bilinear_sampling, frames,
            )
        return loss

    def _layer_loss(self, target_vgg, source_vgg, flow, mask,
                    use_bilinear_sampling, frames=None):
        # precision-sensitive correlation math runs in fp32 even when the
        # VGG forward ran in bf16
        target_vgg = target_vgg.astype(_acc(target_vgg))
        source_vgg = source_vgg.astype(_acc(source_vgg))
        B, H, W, C = target_vgg.shape
        if flow.shape[1] != H or flow.shape[2] != W:
            # spatial resize WITHOUT value rescaling; F.interpolate default
            # mode is NEAREST (external_function.py:254)
            flow = _nearest_resize(flow, H, W)

        t = target_vgg.reshape(B, H * W, C)
        s = source_vgg.reshape(B, H * W, C)
        s_norm = s / (_safe_norm(s, 2)[..., None] + _EPS)
        t_norm = t / (_safe_norm(t, 2)[..., None] + _EPS)
        cmax = _chunked_max_correlation(s_norm, t_norm)  # (B, N)

        if use_bilinear_sampling:
            sampled = _bilinear_warp(source_vgg, flow)
        else:
            sampled = gaussian_resample(source_vgg, flow, 4, 1, 2.0)
        sampled = sampled.reshape(B, H * W, C)

        # torch cosine_similarity semantics: denominator clamped at eps
        num = jnp.sum(sampled * t, axis=2)
        den = jnp.maximum(_safe_norm(sampled, 2) * _safe_norm(t, 2), 1e-8)
        cs = num / den
        loss_map = jnp.exp(-cs / (cmax + _EPS))  # (B[*T], N)
        e1 = jnp.exp(jnp.asarray(-1.0))
        if mask is None:
            if frames is None:
                return jnp.mean(loss_map) - e1
            # per-frame means summed (Σ_t mean_t), on the folded batch
            lm = loss_map.reshape(-1, frames, H * W)
            return jnp.sum(jnp.mean(lm, axis=(0, 2)) - e1)
        # F.interpolate default mode is NEAREST (external_function.py:281)
        m = mask if mask.shape[1:3] == (H, W) else _nearest_resize(mask, H, W)
        m = m.reshape(B, H * W)
        loss_map = loss_map - e1
        if frames is None:
            return jnp.sum(m * loss_map) / (jnp.sum(m) + _EPS)
        # per-frame normalized mask sums (Σ_t sum(m_t·l_t)/(sum(m_t)+ε))
        lm = loss_map.reshape(-1, frames, H * W)
        mm = m.reshape(-1, frames, H * W)
        num_t = jnp.sum(mm * lm, axis=(0, 2))
        den_t = jnp.sum(mm, axis=(0, 2)) + _EPS
        return jnp.sum(num_t / den_t)
