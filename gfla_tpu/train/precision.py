"""Mixed precision: fp32 master params, bf16 compute.

TPU MXU peak throughput needs bf16 operands and halves HBM traffic for
activations. The cast happens inside the jitted step (cast-transpose sums
gradients back into fp32 masters), so modules stay dtype-agnostic and the
optimizer state stays fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_dtype(name: str):
    return jnp.bfloat16 if name in ("bfloat16", "bf16") else jnp.float32


def cast_tree(tree, dtype):
    """Cast all floating-point leaves to `dtype` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def to_f32(tree):
    return cast_tree(tree, jnp.float32)
