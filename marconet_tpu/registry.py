"""Name -> class registries for config-driven construction.

The reference dispatches networks/datasets/losses from YAML ``type:``
fields through basicsr's filename-scanned registries
(``Train/tspgan/{archs,data,models,losses}/__init__.py``). This is the
explicit, import-time equivalent: small named registries with a ``build``
helper; no filesystem scanning magic.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, Any] = {}

    def register(self, cls=None, *, name: str = None):
        def deco(c):
            key = name or c.__name__
            if key in self._map and self._map[key] is not c:
                raise KeyError(f"{key} already registered in {self.name}")
            self._map[key] = c
            return c

        return deco(cls) if cls is not None else deco

    def get(self, key: str):
        try:
            return self._map[key]
        except KeyError:
            raise KeyError(
                f"{key!r} not in {self.name} registry; known: "
                f"{sorted(self._map)}") from None

    def build(self, spec: Dict[str, Any], **extra):
        spec = dict(spec)
        cls = self.get(spec.pop("type"))
        return cls(**spec, **extra)

    def __contains__(self, key):
        return key in self._map


ARCHS = Registry("archs")
DATASETS = Registry("datasets")
LOSSES = Registry("losses")
MODELS = Registry("models")


def _populate():
    """Register the built-in components (reference type names kept so
    existing YAML configs translate directly)."""
    from marconet_tpu.models.encoder import TextContextEncoder
    from marconet_tpu.models.prior import StructurePriorGenerator
    from marconet_tpu.models.srnet import StructurePriorSRNet
    from marconet_tpu.train.discriminators import UNetDiscriminatorSN
    from marconet_tpu.data.synth import TextLineSynthesizer
    from marconet_tpu.data.val_stub import ValStubDataset

    for name, cls in {
        "TextContextEncoderV2": TextContextEncoder,
        "TSPGAN": StructurePriorGenerator,
        "TSPSRNet": StructurePriorSRNet,
        "UNetDiscriminatorSN": UNetDiscriminatorSN,
    }.items():
        if name not in ARCHS:
            ARCHS.register(cls, name=name)
    if "TextDegradationDataset" not in DATASETS:
        DATASETS.register(TextLineSynthesizer,
                          name="TextDegradationDataset")
    if "ValDataset" not in DATASETS:
        DATASETS.register(ValStubDataset, name="ValDataset")


_populate()
