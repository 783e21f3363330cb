from .checkpoints import (save_checkpoint, load_checkpoint, checkpoint_path,
                          resolve_checkpoint)
from .loop import (
    TrainState, train_multiple_epochs, train_multiple_epochs_ep, test_once,
    test_once_ep, eval_rmse, predict_all, make_train_step, make_eval_step,
)
from .torch_interop import (load_reference_checkpoint,
                            save_reference_checkpoint,
                            params_from_state_dict, state_dict_from_params)

__all__ = [
    "save_checkpoint", "load_checkpoint", "checkpoint_path",
    "resolve_checkpoint",
    "TrainState", "train_multiple_epochs", "train_multiple_epochs_ep",
    "test_once", "test_once_ep", "eval_rmse",
    "predict_all", "make_train_step", "make_eval_step",
    "load_reference_checkpoint", "save_reference_checkpoint",
    "params_from_state_dict", "state_dict_from_params",
]
