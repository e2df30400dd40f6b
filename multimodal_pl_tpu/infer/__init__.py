"""Full-volume inference: batched sliding window + Gaussian blending + metrics."""

from multimodal_pl_tpu.infer.gaussian import gaussian_importance_map
from multimodal_pl_tpu.infer.sliding import make_window_grid, SlidingWindowPredictor
from multimodal_pl_tpu.infer.metrics import (
    dice_score,
    senc_score,
    spec_score,
    organ_scores,
    organ_scores_atlas,
)
