"""Training: FP8 fine-tuning harness (trainer, data, stability analytics)."""
from .trainer import TrainConfig, TrainState, Trainer, make_optimizer
from .losses import causal_lm_loss, IGNORE_INDEX
from .data import DataConfig, DataManager, make_batches, CHAT_TEMPLATE, ResumableBatches, synthetic_examples
from .stability import StabilityTracker, series_stats
from .checkpoint import CheckpointManager, export_hf
from .quant_state import (
    init_train_quant_state,
    forward_scales,
    make_sinks,
    update_quant_state,
)

__all__ = [
    "TrainConfig", "TrainState", "Trainer", "make_optimizer",
    "causal_lm_loss", "IGNORE_INDEX",
    "DataConfig", "DataManager", "make_batches", "CHAT_TEMPLATE",
    "ResumableBatches", "synthetic_examples",
    "StabilityTracker", "series_stats",
    "CheckpointManager", "export_hf",
    "init_train_quant_state", "forward_scales", "make_sinks",
    "update_quant_state",
]
