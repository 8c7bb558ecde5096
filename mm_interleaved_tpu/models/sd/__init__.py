from .scheduler import DiffusionSchedule
from .vae import AutoencoderKL, VAEConfig
from .unet import UNet2DConditionModel, UNetConfig
from .mmfs_net import MMFSNet, MMFSNetConfig

__all__ = [
    "DiffusionSchedule",
    "AutoencoderKL",
    "VAEConfig",
    "UNet2DConditionModel",
    "UNetConfig",
    "MMFSNet",
    "MMFSNetConfig",
]
