#!/usr/bin/env python
"""Training entry point (reference CLI parity).

Mirrors /root/reference/training/train.py:126-190: argument parsing ->
FlamingoConfig (OPT-125m + CLIP ViT-L/14, the reference's published training
config, train.py:149-156) -> datasets -> trainer.train(resume).

TPU-native: one process drives all local chips through a jax mesh (no
torchrun; multi-host runs call jax.distributed.initialize via --coordinator).
"""
import argparse
import dataclasses
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flamingo_mini_tpu import FlamingoConfig, FlamingoModel, FlamingoProcessor
from flamingo_mini_tpu.parallel import distributed_init
from flamingo_mini_tpu.train.data import (
    CocoCaptionDataset, CocoCaptionEvalDataset, DataCollator,
    SyntheticCaptionDataset, SyntheticEvalDataset)
from flamingo_mini_tpu.train.trainer import FlamingoTrainer, TrainingArguments


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    for f in dataclasses.fields(TrainingArguments):
        name = "--" + f.name.replace("_", "-")
        tstr = str(f.type)
        if "bool" in tstr or isinstance(f.default, bool):
            p.add_argument(name, action="store_true", default=f.default)
        elif "int" in tstr:
            p.add_argument(name, type=int, default=f.default)
        elif "float" in tstr:
            p.add_argument(name, type=float, default=f.default)
        elif "tuple" in tstr:
            p.add_argument(name, type=lambda s: tuple(int(x) for x in s.split("x")),
                           default=f.default)
        else:
            p.add_argument(name, type=str, default=f.default)
    p.add_argument("--lm", default="facebook/opt-125m")
    p.add_argument("--clip-model-type", default="openai/clip-vit-large-patch14")
    p.add_argument("--dim", type=int, default=768)
    p.add_argument("--dim-visual", type=int, default=1024)
    p.add_argument("--resampler-act", default="sqrelu")
    p.add_argument("--xattn-act", default="sqrelu")
    p.add_argument("--coco-root", default=None)
    p.add_argument("--coco-ann-file", default=None)
    p.add_argument("--coco-val-root", default=None,
                   help="COCO val images dir (held-out eval; reference "
                        "training/train.py:160-168 evaluates the val split)")
    p.add_argument("--coco-val-ann-file", default=None)
    p.add_argument("--synthetic-size", type=int, default=0,
                   help="use a synthetic dataset of this size instead of COCO")
    p.add_argument("--lm-arch-overrides", default=None,
                   help="JSON dict of LM arch overrides (tiny smoke runs)")
    p.add_argument("--vision-arch-overrides", default=None,
                   help="JSON dict of vision arch overrides")
    p.add_argument("--resume-from-checkpoint", default=None)
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address (host:port)")
    p.add_argument("--vocab-path", default=None)
    return p.parse_args()


def main():
    ns = parse_args()
    logging.basicConfig(
        level=logging.INFO,
        format=f"%(asctime)s - %(levelname)s - %(name)s - %(message)s")

    if ns.coordinator:
        distributed_init(coordinator=ns.coordinator)

    arg_names = {f.name for f in dataclasses.fields(TrainingArguments)}
    args = TrainingArguments(**{k: v for k, v in vars(ns).items()
                                if k in arg_names})

    # the reference's published training config (train.py:149-156)
    import json
    config = FlamingoConfig(
        lm=ns.lm, clip_model_type=ns.clip_model_type, dim=ns.dim,
        dim_visual=ns.dim_visual, xattn_act=ns.xattn_act,
        resampler_act=ns.resampler_act, compute_dtype="bfloat16",
        lm_arch_overrides=json.loads(ns.lm_arch_overrides)
        if ns.lm_arch_overrides else None,
        vision_arch_overrides=json.loads(ns.vision_arch_overrides)
        if ns.vision_arch_overrides else None)

    model = FlamingoModel(config)
    try:
        processor = FlamingoProcessor(config, vocab_path=ns.vocab_path)
    except FileNotFoundError:
        if not ns.synthetic_size:
            raise
        # synthetic smoke runs work without local vocab files
        from flamingo_mini_tpu.tokenizer import build_toy_tokenizer
        from flamingo_mini_tpu.train.data import SyntheticCaptionDataset
        processor = FlamingoProcessor(
            config, tokenizer=build_toy_tokenizer(
                ["image"] + SyntheticCaptionDataset().vocab))
    collator = DataCollator(processor, length=args.sequence_length)

    if ns.synthetic_size:
        train_ds = SyntheticCaptionDataset(size=ns.synthetic_size)
        # held-out synthetic eval set (different seed -> different samples)
        eval_ds = SyntheticEvalDataset(
            SyntheticCaptionDataset(size=min(ns.synthetic_size, 64),
                                    seed=10_000))
    else:
        assert ns.coco_root and ns.coco_ann_file, \
            "pass --coco-root/--coco-ann-file or --synthetic-size"
        train_ds = CocoCaptionDataset(ns.coco_root, ns.coco_ann_file)
        # the reference evaluates the COCO *val* split
        # (training/train.py:160-168), never the training set
        eval_ds = None
        if ns.coco_val_root and ns.coco_val_ann_file:
            eval_ds = CocoCaptionEvalDataset(ns.coco_val_root,
                                             ns.coco_val_ann_file)

    trainer = FlamingoTrainer(model, args, train_dataset=train_ds,
                              eval_dataset=eval_ds, collator=collator,
                              processor=processor)
    trainer.train(resume_from_checkpoint=ns.resume_from_checkpoint)
    trainer.params
    model.save_pretrained(os.path.join(args.output_dir, "final"))


if __name__ == "__main__":
    main()
