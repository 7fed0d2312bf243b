from transception_tpu.core.config import (  # noqa: F401
    TransceptionConfig,
    TrainConfig,
    DataConfig,
    br_config_to_ch_att_list,
    CRPE_WINDOW,
)
