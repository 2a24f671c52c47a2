"""swindet_tpu: TPU-native (JAX/XLA/Pallas/pjit) object-detection framework
with the capability surface of Swin-Transformer-Object-Detection
(an mmdetection v2.11 fork; reference mounted at /root/reference).

Design: functional core (pure jitted step functions over pytrees), static
shapes everywhere (padding + validity masks), config/registry shell
preserving the reference's public API surface.
"""
from .version import __version__, short_version

__all__ = ['__version__', 'short_version']
