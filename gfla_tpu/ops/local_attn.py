"""Fused local-attention warp — the GFLA hot path, TPU-native.

Implements the full ``ExtractorAttn`` inner computation
(reference: model/networks/base_function.py:790-818) as one functional op:

  1. block_source = flow-displaced k×k blocks of `source`
  2. block_target = zero-flow k×k blocks of `target`  (pad+shift, no gather)
  3. attention logits = Conv(k×k, stride k)(concat(target, source) tiles)
     → hidden 128 → 1×1 conv → k² channels → softmax over k²
  4. out = avg_pool_k(attn_tiles · block_source)
         = (1/k²) Σ_k softmax(logits)_k · block_source_k

TPU reformulation: a stride-k conv over k×k tiles touches each tile exactly
once, so it is a per-location dense layer over the flattened (k²·2C) block
vector — one big einsum on the MXU instead of an im2col conv. The k²-way
softmax and the weighted block sum are VPU work that XLA fuses. Nothing is
ever materialised in the reference's (B, C, kH, kW) tile layout.

Weight layout contract (for torch-checkpoint conversion): the reference's
first conv has torch weight (128, 2C, k, k); ours is W1 (k², 2C, 128) with
k² index = i·k + j, i.e. W1[i*k+j, c, d] == torch_w[d, c, i, j]. The channel
concat order is (block_target, block_source), matching
base_function.py:807. The second conv is 1×1: W2 (128, k²),
W2[d, m] == torch_w2[m, d, 0, 0].
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import jax.numpy as jnp

from gfla_tpu.ops.block_extract import block_extract, extract_patches


def _warp_default_ok() -> bool:
    """Warp-by-default only on real TPU backends: on CPU the kernel runs
    in interpret mode (orders of magnitude slower), so CPU tests/smokes
    default to the XLA composition unless GFLA_ATTN_PALLAS=warp forces
    the kernel (which then runs interpreted)."""
    return jax.default_backend() == "tpu"


def local_attn_warp(
    source: jax.Array,
    target: jax.Array,
    flow: jax.Array,
    kernel_size: int,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    activation: Callable[[jax.Array], jax.Array] | None = None,
    return_attn: bool = False,
    use_pallas: str | bool = "auto",
):
    """Fused extractor-attention warp.

    Args:
      source: (B, H, W, C) source feature map (same resolution as flow —
        all live call sites in the reference satisfy this).
      target: (B, H, W, C) target feature map.
      flow:   (B, H, W, 2) flow field, last dim (x, y).
      kernel_size: local attention block size k.
      w1: (k², 2C, D) first projection (reference: k-stride conv 2C→D=128).
      b1: (D,) bias.
      w2: (D, k²) logit projection (reference: 1×1 conv D→k²).
      b2: (k²,) bias.
      activation: nonlinearity between the two projections
        (default LeakyReLU(0.1) — the reference passes the network's
        nonlinearity; live configs use LeakyReLU).
      return_attn: also return the softmaxed (B, H, W, k²) attention map
        (reference hook_attn_param, base_function.py:812-818).

    Returns:
      (B, H, W, C) warped features; optionally (attn, out).
    """
    default_act = activation is None or getattr(
        activation, "__gfla_leaky01__", False
    )
    if activation is None:
        activation = lambda x: jax.nn.leaky_relu(x, 0.1)
    k = kernel_size
    k2 = k * k

    if use_pallas == "auto":
        # GFLA_ATTN_PALLAS forces the path: 0 = XLA composition, 1 =
        # math-fused Pallas (ops/pallas_attn.py: gather in XLA, attention
        # math in VMEM), warp = fully-fused Pallas (ops/pallas_warp.py:
        # gather + blend + attention + scatter all in VMEM).
        # DEFAULT on TPU: warp where eligible. Measured end-to-end on v5e
        # at the fashion config (bench.py, 20 iters): warp-fused
        # 94.7 img/s vs XLA 74.0 (+28%) — the kernel replaces the XLA
        # row-gather and its sort/segment-sum scatter transpose, the
        # single biggest step cost (fwd+bwd at the k=5/64²/C=128 site:
        # 23.3 ms fused vs 47.7 ms XLA; the k=3/32²/C=256 site is a tie).
        # The math-fused kernel (=1) remains the low-HBM middle option
        # (69.1 img/s; pallas_call is a fusion barrier there).
        env = os.environ.get("GFLA_ATTN_PALLAS", "auto")
        if env in ("0", "1"):
            use_pallas = env == "1"
        elif env == "warp":
            use_pallas = "warp"
        else:
            use_pallas = "warp" if _warp_default_ok() else False

    if use_pallas == "warp" and not return_attn:
        from gfla_tpu.ops.pallas_warp import (
            fused_warp_eligible, local_attn_warp_fused,
        )

        if fused_warp_eligible(source, target, flow, k, w1,
                               return_attn, default_act):
            return local_attn_warp_fused(
                source, target, flow, k, w1, b1, w2, b2, 0.1,
                interpret=jax.default_backend() == "cpu",
            )
        use_pallas = False  # ineligible shape: XLA composition

    def _compute(source, target, flow, w1, b1, w2, b2):
        block_source = block_extract(source, flow, k)  # (B,H,W,k²,C)
        block_target = extract_patches(target, k)      # (B,H,W,k²,C)
        # fp32 accumulation for low-precision inputs; preserves f64 w/ x64
        acc = jnp.promote_types(source.dtype, jnp.float32)

        if use_pallas and not return_attn and default_act:
            from gfla_tpu.ops.pallas_attn import attn_math_fused

            B, H, W, _, C = block_source.shape
            out = attn_math_fused(
                block_source.reshape(-1, k2, C),
                block_target.reshape(-1, k2, C),
                w1, b1, w2, b2,
                0.1,
                # Mosaic kernels only lower on TPU (incl. the axon tunnel
                # backend); interpret on CPU so a forced GFLA_ATTN_PALLAS=1
                # still runs in CPU tests.
                jax.default_backend() == "cpu",
            )
            return out.reshape(B, H, W, C).astype(source.dtype)

        cat = jnp.concatenate([block_target, block_source], axis=-1)
        hidden = (                                     # (B,H,W,k²,2C) → D
            jnp.einsum("bhwkc,kcd->bhwd", cat, w1,
                       preferred_element_type=acc)
            + b1
        )
        hidden = activation(hidden)
        logits = (
            jnp.einsum("bhwd,dk->bhwk", hidden, w2,
                       preferred_element_type=acc)
            + b2
        )
        attn = jax.nn.softmax(logits, axis=-1)  # (B, H, W, k²)

        # avg_pool_k(attn_tiles * block_source) == (1/k²) Σ attn·block.
        out = (
            jnp.einsum(
                "bhwk,bhwkc->bhwc",
                attn.astype(block_source.dtype),
                block_source,
                preferred_element_type=acc,
            )
            / float(k2)
        ).astype(source.dtype)

        if return_attn:
            return attn, out
        return out

    if os.environ.get("GFLA_ATTN_REMAT", "0") == "1" and not return_attn:
        # Recompute the whole warp in backward instead of saving the
        # (B,H,W,k²,C) block tensors + attention intermediates as VJP
        # residuals — trades a cheap gather/einsum replay for the HBM
        # round-trip of the step's largest activations.
        _compute = jax.checkpoint(
            _compute, policy=jax.checkpoint_policies.nothing_saveable
        )
    return _compute(source, target, flow, w1, b1, w2, b2)
