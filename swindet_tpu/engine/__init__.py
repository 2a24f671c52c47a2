from .optimizer import build_optimizer, build_multiplier_trees
from .schedules import build_lr_schedule
from .train_step import TrainState, make_train_step, jit_train_step, parse_losses

__all__ = [
    'build_optimizer', 'build_multiplier_trees', 'build_lr_schedule',
    'TrainState', 'make_train_step', 'jit_train_step', 'parse_losses',
]
