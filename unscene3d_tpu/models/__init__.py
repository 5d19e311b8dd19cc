"""Model registry, mirroring the reference's name-based loaders
(models/__init__.py:18-31 and models/encoders_2d/__init__.py:16-29)."""

from unscene3d_tpu.models.backbone import (
    Res16UNet14A,
    Res16UNet18A,
    Res16UNet18B,
    Res16UNet34A,
    Res16UNet34B,
    Res16UNet34C,
    Res16UNet34D,
    Res16UNetBase,
)
from unscene3d_tpu.models.mask3d import Mask3D
from unscene3d_tpu.models.resunet import (
    MinkUNetBase,
    ResNet14,
    ResNet18,
    ResNet34,
    ResNetBase,
    ResUNet14,
    ResUNet14A,
    ResUNet18,
    ResUNet18A,
    ResUNet34,
)

_MODELS = {
    "Res16UNet14A": Res16UNet14A,
    "Res16UNet18A": Res16UNet18A,
    "Res16UNet18B": Res16UNet18B,
    "Res16UNet34A": Res16UNet34A,
    "Res16UNet34B": Res16UNet34B,
    "Res16UNet34C": Res16UNet34C,
    "Res16UNet34D": Res16UNet34D,
    "Mask3D": Mask3D,
    "ResUNet14": ResUNet14,
    "ResUNet14A": ResUNet14A,
    "ResUNet18": ResUNet18,
    "ResUNet18A": ResUNet18A,
    "ResUNet34": ResUNet34,
    "ResNet14": ResNet14,
    "ResNet18": ResNet18,
    "ResNet34": ResNet34,
}


def load_model(name: str):
    if name not in _MODELS:
        raise KeyError(f"unknown model {name!r}; known: {sorted(_MODELS)}")
    return _MODELS[name]
