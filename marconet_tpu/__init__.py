"""marconet_tpu — a TPU-native blind text-line super-resolution framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of MARCONet
("Learning Generative Structure Prior for Blind Text Image Super-resolution",
CVPR 2023; reference implementation csxmli2016/MARCONet).

Subpackages
-----------
- ``ops``      : TPU-first numerical primitives (fused activations, modulated
                 convolution, masked normalization, resize semantics).
- ``models``   : the three core networks (text-context encoder, structure
                 prior generator, SR network), the legacy transformer OCR and
                 the detection/recognition front-end.
- ``convert``  : PyTorch checkpoint -> JAX pytree importers.
- ``parallel`` : device-mesh / sharding utilities (data-parallel over ICI).
- ``data``     : synthetic text rendering + Real-ESRGAN/BSRGAN degradations.
- ``train``    : losses, discriminators, GAN training step, optimizers.
- ``utils``    : image metrics & IO helpers.
"""

from marconet_tpu.version import __version__
from marconet_tpu.alphabet import ALPHABET, NUM_CLASSES, BLANK_INDEX

__all__ = ["__version__", "ALPHABET", "NUM_CLASSES", "BLANK_INDEX"]
