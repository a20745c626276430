"""Training: loss, optimizer groups, schedulers, train step, checkpoints."""

from unimp_tpu.train.loss import masked_focal_loss
from unimp_tpu.train.optimizer import make_optimizer, make_schedule

__all__ = ["masked_focal_loss", "make_optimizer", "make_schedule"]
