from marconet_tpu.convert.torch_import import (
    convert_encoder,
    convert_prior,
    convert_srnet,
    load_reference_checkpoints,
)

__all__ = [
    "convert_encoder",
    "convert_prior",
    "convert_srnet",
    "load_reference_checkpoints",
]
