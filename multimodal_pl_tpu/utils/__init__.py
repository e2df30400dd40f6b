"""Utilities: schedules, seeding, metrics logging, profiling."""

from multimodal_pl_tpu.utils.schedule import lr_poly, adjust_learning_rate
from multimodal_pl_tpu.utils.logging import MetricsLogger
from multimodal_pl_tpu.utils.prng import seedfix
