from .losses import loss_s1, loss_s2, loss_siren
from .schedule import lr_for_epoch
from .loop import TrainState, Trainer
from . import checkpoint

__all__ = [
    "loss_s1",
    "loss_s2",
    "loss_siren",
    "lr_for_epoch",
    "TrainState",
    "Trainer",
    "checkpoint",
]
