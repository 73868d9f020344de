"""TPU-native compute primitives for flamingo-mini-tpu.

This package is the "kernel tier" of the framework: pure functions over JAX
arrays, written for the XLA/TPU compilation model (static shapes, fused
elementwise chains, MXU-friendly matmuls) with optional Pallas fast paths.
"""
from .layers import (
    Policy,
    PARITY,
    FAST,
    policy_for,
    dot,
    layer_norm,
    linear,
    gelu_erf,
    gelu_tanh,
    quick_gelu,
    squared_relu,
    get_activation,
    init_layer_norm,
    init_linear,
    init_feed_forward,
    feed_forward,
)
from .attention import (
    NEG_MAX,
    attend,
    split_heads,
    merge_heads,
)

__all__ = [
    "Policy", "PARITY", "FAST", "policy_for", "dot", "layer_norm", "linear",
    "gelu_erf", "gelu_tanh", "quick_gelu", "squared_relu", "get_activation",
    "init_layer_norm", "init_linear", "init_feed_forward", "feed_forward",
    "NEG_MAX", "attend", "split_heads", "merge_heads",
]
