from .optim import make_optimizer, onecycle_with_cutoff, quantile_clip, weight_decay_mask
from .step import TrainState, init_train_state, make_train_step
