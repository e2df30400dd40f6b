"""Loss library: partial-label masked Dice/CE, refiner/GAN losses, legacy zoo."""

from multimodal_pl_tpu.losses.dice import (
    binary_dice_masked,
    dice_per_class,
    multiclass_dice,
)
from multimodal_pl_tpu.losses.partial import (
    edice_partial,
    edice_full,
    edice_full2,
    bce_probs,
    softmax_cross_entropy,
)
from multimodal_pl_tpu.losses.compose import (
    segmentation_loss,
    refine_loss,
    feature_ramp,
)
from multimodal_pl_tpu.losses.gan import smooth_cross_entropy, bce_loss
