from pqa2_tpu.models.loader import (
    VMAFModel,
    BootstrapModel,
    load_model,
    parse_model_json,
)
from pqa2_tpu.models.registry import available_models, get_model

__all__ = [
    "VMAFModel",
    "BootstrapModel",
    "load_model",
    "parse_model_json",
    "available_models",
    "get_model",
]
