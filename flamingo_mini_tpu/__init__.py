"""flamingo-mini-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language
framework with the capabilities of dhansmair/flamingo-mini.

Public API (parity with the reference package
/root/reference/flamingo_mini/__init__.py:1-3):
  FlamingoConfig, FlamingoModel, FlamingoProcessor
"""
from .configuration_flamingo import FlamingoConfig
from .flamingo_processor import FlamingoProcessor
from .modeling_flamingo import FlamingoModel

__all__ = ["FlamingoConfig", "FlamingoModel", "FlamingoProcessor"]
__version__ = "0.1.0"
