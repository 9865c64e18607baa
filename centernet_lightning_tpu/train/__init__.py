from .optim import make_lr_schedule, make_optimizer
from .state import TrainState, create_train_state, make_eval_step, make_train_step
