"""Loss layer (L5 of the reference layer map)."""

from gfla_tpu.losses.adversarial import adversarial_loss
from gfla_tpu.losses.affine_reg import (
    AffineRegularizationLoss,
    MultiAffineRegularizationLoss,
)
from gfla_tpu.losses.perceptual import (
    PerceptualCorrectness,
    gram_matrix,
    l1_loss,
    vgg_content_style_loss,
)

__all__ = [
    "adversarial_loss",
    "AffineRegularizationLoss",
    "MultiAffineRegularizationLoss",
    "PerceptualCorrectness",
    "gram_matrix",
    "l1_loss",
    "vgg_content_style_loss",
]
