from transception_tpu.serve.export import (  # noqa: F401
    export_model,
    load_model,
    save_exported,
    load_exported,
)
