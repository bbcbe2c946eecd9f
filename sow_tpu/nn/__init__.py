from sow_tpu.nn.sow import SoWLinear, sow_forward_unfolded
from sow_tpu.nn.surgery import (
    SoWConfig,
    SoWModel,
    accumulate,
    iter_sow,
    linear_apply,
    map_sow,
    param_labels,
    prepare_sow,
    set_sow_scale,
    sow_from_kernel,
)

__all__ = [
    "SoWLinear",
    "SoWModel",
    "SoWConfig",
    "accumulate",
    "iter_sow",
    "linear_apply",
    "map_sow",
    "param_labels",
    "prepare_sow",
    "set_sow_scale",
    "sow_from_kernel",
    "sow_forward_unfolded",
]
