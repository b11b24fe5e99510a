from marconet_tpu.models.encoder import TextContextEncoder
from marconet_tpu.models.prior import StructurePriorGenerator
from marconet_tpu.models.srnet import StructurePriorSRNet

__all__ = [
    "TextContextEncoder",
    "StructurePriorGenerator",
    "StructurePriorSRNet",
]
