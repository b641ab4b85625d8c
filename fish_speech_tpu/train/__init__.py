from .step import TrainBatch, dual_ar_loss, make_optimizer, make_train_step
from .scheduler import cosine_warmup_schedule, constant_warmup_schedule

__all__ = [
    "TrainBatch", "dual_ar_loss", "make_optimizer", "make_train_step",
    "cosine_warmup_schedule", "constant_warmup_schedule",
]
