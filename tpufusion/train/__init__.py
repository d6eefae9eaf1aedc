from tpufusion.train.train_step import make_train_step, make_eval_step
from tpufusion.train.trainer import Trainer
from tpufusion.train.stats import population_weights

__all__ = ["make_train_step", "make_eval_step", "Trainer", "population_weights"]
