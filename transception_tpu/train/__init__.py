from transception_tpu.train.losses import (  # noqa: F401
    dice_loss,
    cross_entropy_loss,
    segmentation_loss,
)
