"""Training system (reference: ``src/system/``)."""
from .core import System, TrainState, online_mixing_collate
from .optimizers import make_optimizer, get_lr, set_lr
from .schedulers import ReduceLROnPlateau, StaircaseLR, EarlyStopping
from .trainer import Trainer
from .checkpoint import CheckpointManager
from .tb_writer import TensorBoardLogger

__all__ = [
    "System",
    "TrainState",
    "Trainer",
    "CheckpointManager",
    "TensorBoardLogger",
    "online_mixing_collate",
    "make_optimizer",
    "get_lr",
    "set_lr",
    "ReduceLROnPlateau",
    "StaircaseLR",
    "EarlyStopping",
]
