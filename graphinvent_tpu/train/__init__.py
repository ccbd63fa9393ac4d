from graphinvent_tpu.train.loss import apd_kl_loss
from graphinvent_tpu.train.optim import (
    OneCycle, adam_init, adam_update, onecycle_for_config,
)

__all__ = ["apd_kl_loss", "OneCycle", "adam_init", "adam_update",
           "onecycle_for_config"]
