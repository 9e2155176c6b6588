from .stage1 import Stage1TrainState, make_stage1_train_step, make_stage1_eval_step

__all__ = [
    "Stage1TrainState",
    "make_stage1_train_step",
    "make_stage1_eval_step",
]
