from .checkpoints import save_checkpoint, load_checkpoint, checkpoint_path
from .loop import (
    TrainState, train_multiple_epochs, test_once, eval_rmse, predict_all,
    make_train_step, make_eval_step,
)

__all__ = [
    "save_checkpoint", "load_checkpoint", "checkpoint_path",
    "TrainState", "train_multiple_epochs", "test_once", "eval_rmse",
    "predict_all", "make_train_step", "make_eval_step",
]
