from transception_tpu.convert.torch2flax import (  # noqa: F401
    convert_state_dict,
    flax_path_to_torch_key,
    load_pth_checkpoint,
)
