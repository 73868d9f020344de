"""Neural modules of the flamingo-mini-tpu framework (pure-functional JAX).

Submodules (import directly, e.g. ``from flamingo_mini_tpu.models import
resampler``): resampler, xattn, gpt2, opt, clip_vit, flamingo.
"""
