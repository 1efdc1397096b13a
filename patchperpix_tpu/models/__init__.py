from .autoencoder import PatchDecoder  # noqa: F401
from .ppp import PPPConfig, PPPModel, apply_activations  # noqa: F401
from .unet import UNet, valid_output_shape  # noqa: F401
