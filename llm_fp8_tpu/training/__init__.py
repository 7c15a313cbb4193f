"""Training: FP8 fine-tuning harness (trainer, data, stability analytics)."""
from .trainer import TrainConfig, TrainState, Trainer, make_optimizer
from .losses import causal_lm_loss, IGNORE_INDEX
from .data import DataConfig, DataManager, make_batches, CHAT_TEMPLATE
from .stability import StabilityTracker, series_stats
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
    "StabilityTracker", "series_stats",
    "init_train_quant_state", "forward_scales", "make_sinks",
    "update_quant_state",
]
