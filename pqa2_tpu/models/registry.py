"""Built-in model registry.

The framework ships the standard Netflix VMAF models preparsed to dense .npz
arrays (see tools/convert_vmaf_model.py). Names mirror libvmaf's
``model=version=...`` identifiers, which is also what the reference app passes
around (app/vmaf_analyzer.py:373-380 builds ``model=version={model}``; the UI
discovers names by scanning models/*.json, app/ui/tabs/analysis_tab.py:1005).
"""

from __future__ import annotations

import functools
import os
from typing import List

from pqa2_tpu.models.loader import load_model, load_model_npz

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")

DEFAULT_MODEL = "vmaf_v0.6.1"


def available_models() -> List[str]:
    """Names of all packaged models (without extension)."""
    if not os.path.isdir(_DATA_DIR):
        return []
    return sorted(
        f[: -len(".npz")] for f in os.listdir(_DATA_DIR) if f.endswith(".npz")
    )


@functools.lru_cache(maxsize=None)
def get_model(name: str = DEFAULT_MODEL):
    """Load a model by registry name, or by path to a libvmaf .json/.npz file."""
    if os.path.sep in name or name.endswith((".json", ".npz")):
        if name.endswith(".npz"):
            return load_model_npz(name)
        return load_model(name)
    path = os.path.join(_DATA_DIR, f"{name}.npz")
    if not os.path.exists(path):
        raise KeyError(
            f"unknown model {name!r}; available: {available_models()}"
        )
    return load_model_npz(path, name=name)
