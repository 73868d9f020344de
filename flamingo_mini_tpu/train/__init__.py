"""Training tier: optimizer, trainer loop, data pipeline, checkpointing.

Replaces the reference's HF-Trainer-based harness
(/root/reference/training/train.py:87-190) with a TPU-native loop: optax
AdamW + constant-warmup over the trainable partition, jit-compiled train step
over a device mesh (DP by default, optional TP), Orbax checkpointing, and a
captioning-eval hook.
"""
from .trainer import FlamingoTrainer, TrainingArguments
from .data import CaptionSample, DataCollator, SyntheticCaptionDataset

__all__ = ["FlamingoTrainer", "TrainingArguments", "CaptionSample",
           "DataCollator", "SyntheticCaptionDataset"]
