from dualpixelface_tpu.train.optim import optimizer_selector, scheduler_selector
from dualpixelface_tpu.train.state import TrainState, create_train_state
from dualpixelface_tpu.train.trainer import Trainer
