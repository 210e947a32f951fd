from .schedule import warmup_cosine_sq_schedule
from .optim import build_optimizer
from .state import TrainState, create_train_state
from .step import make_train_step, make_train_multistep, make_eval_step
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step
