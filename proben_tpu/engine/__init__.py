from .predictor import Predictor
from .train import TrainState, make_train_step

__all__ = ["Predictor", "TrainState", "make_train_step"]
