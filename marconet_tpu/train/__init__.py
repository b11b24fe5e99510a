from marconet_tpu.train.discriminators import UNetDiscriminatorSN
from marconet_tpu.train import losses

__all__ = ["UNetDiscriminatorSN", "losses"]
