from .defaults import DefaultTrainer
from .hooks import (
    CallbackHook,
    EvalHook,
    HookBase,
    IterationTimer,
    PeriodicCheckpointer,
    PeriodicWriter,
    PreciseBNHook,
)
from .predictor import Predictor
from .train import TrainState, make_train_step

__all__ = [
    "DefaultTrainer",
    "CallbackHook",
    "EvalHook",
    "HookBase",
    "IterationTimer",
    "PeriodicCheckpointer",
    "PeriodicWriter",
    "PreciseBNHook",
    "Predictor",
    "TrainState",
    "make_train_step",
]
