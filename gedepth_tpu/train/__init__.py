from gedepth_tpu.train.optim import make_optimizer, lr_schedule
from gedepth_tpu.train.state import TrainState, create_train_state
from gedepth_tpu.train.steps import make_train_step, make_eval_step
