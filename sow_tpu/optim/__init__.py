from sow_tpu.optim.adamw import GroupedAdamW, GroupedAdamWState, apply_updates, grouped_adamw
from sow_tpu.optim.schedules import (
    constant_schedule,
    cosine_restarts_schedule,
    cyclical_cosine_schedule,
    get_schedule,
    linear_schedule,
)
from sow_tpu.optim.ttadam import default_tt_spec, pure_tt_adam_update, ttadam
from sow_tpu.optim.ttsgd import ttsgd

__all__ = [
    "GroupedAdamW",
    "GroupedAdamWState",
    "apply_updates",
    "grouped_adamw",
    "constant_schedule",
    "cosine_restarts_schedule",
    "cyclical_cosine_schedule",
    "get_schedule",
    "linear_schedule",
    "default_tt_spec",
    "pure_tt_adam_update",
    "ttadam",
    "ttsgd",
]
