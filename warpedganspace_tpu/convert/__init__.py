"""PyTorch state_dict <-> JAX pytree converters for every model family."""

from warpedganspace_tpu.convert.torch_import import (
    sngan_params_from_state_dict,
    proggan_params_from_state_dict,
    lenet_reconstructor_from_state_dict,
    lenet_reconstructor_to_state_dict,
    resnet_reconstructor_from_state_dict,
    resnet_reconstructor_to_state_dict,
)

__all__ = [
    "sngan_params_from_state_dict",
    "proggan_params_from_state_dict",
    "lenet_reconstructor_from_state_dict",
    "lenet_reconstructor_to_state_dict",
    "resnet_reconstructor_from_state_dict",
    "resnet_reconstructor_to_state_dict",
]
