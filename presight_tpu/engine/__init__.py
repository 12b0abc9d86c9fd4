"""Engine: jitted train step, optimizers, trainer loop, checkpointing."""

from .optimizers import OptimizerGroupConfig, make_group_optimizer, make_optimizer, warmup_multistep_schedule
from .train_step import StepScalars, TrainState, TrainStepPair, init_train_state, make_train_step
