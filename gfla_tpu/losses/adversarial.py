"""Adversarial GAN losses — nsgan | lsgan | hinge.

Capability parity with the reference AdversarialLoss
(model/networks/external_function.py:82-119). `outputs` are raw
discriminator logit maps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def adversarial_loss(
    outputs: jax.Array,
    is_real: bool,
    for_dis: bool = False,
    gan_mode: str = "lsgan",
) -> jax.Array:
    """Scalar GAN loss.

    lsgan: MSE vs the 1/0 label (external_function.py:101-102,116-119).
    hinge: D: mean(relu(1 ∓ x)); G: -mean(x) (external_function.py:108-114).
    nsgan: BCE — the reference applies BCELoss to raw outputs (it would
      require probabilities); we apply it to sigmoid(outputs), the standard
      non-saturating form. No live config uses nsgan.
    """
    if gan_mode == "hinge":
        if for_dis:
            x = -outputs if is_real else outputs
            return jnp.mean(jax.nn.relu(1.0 + x))
        return -jnp.mean(outputs)
    if gan_mode == "lsgan":
        label = 1.0 if is_real else 0.0
        return jnp.mean((outputs - label) ** 2)
    if gan_mode == "nsgan":
        p = jax.nn.sigmoid(outputs)
        p = jnp.clip(p, _EPS, 1.0 - _EPS)
        return -jnp.mean(jnp.log(p) if is_real else jnp.log(1.0 - p))
    raise NotImplementedError(f"gan mode [{gan_mode}] not implemented")
