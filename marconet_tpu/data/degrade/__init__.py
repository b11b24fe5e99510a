from marconet_tpu.data.degrade.realesrgan import real_esrgan_degradation
from marconet_tpu.data.degrade.bsrgan import bsrgan_degradation

__all__ = ["real_esrgan_degradation", "bsrgan_degradation"]
