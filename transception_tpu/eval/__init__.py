from transception_tpu.eval.metrics import (  # noqa: F401
    dice_coefficient,
    hd95,
    metric_per_case,
)
