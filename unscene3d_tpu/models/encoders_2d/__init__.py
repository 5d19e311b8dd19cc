"""2D encoder registry (reference models/encoders_2d/__init__.py:16-29)."""

from unscene3d_tpu.models.encoders_2d.dino import DinoNet, ViTExtractor
from unscene3d_tpu.models.encoders_2d.lseg import LSegNet

_MODELS_2D = {"DinoNet": DinoNet, "LSegNet": LSegNet}


def load_2d_model(name: str):
    if name not in _MODELS_2D:
        raise KeyError(f"unknown 2d model {name!r}; known: {sorted(_MODELS_2D)}")
    return _MODELS_2D[name]
