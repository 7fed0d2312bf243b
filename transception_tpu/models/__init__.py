from transception_tpu.models.transception import MSTransception  # noqa: F401
from transception_tpu.models.registry import create_model, MODEL_REGISTRY  # noqa: F401
