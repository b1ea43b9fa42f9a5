"""Batched TPU inference + test-time refinement (SURVEY §2.6 batch_prediction*/refine)."""

from tf_depth_estimation_tpu.infer.predictor import (
    DepthPredictor,
    FlowAugmentedPredictor,
    PairPredictor,
    TurboPredictor,
)

__all__ = ["DepthPredictor", "FlowAugmentedPredictor", "PairPredictor",
           "TurboPredictor"]
