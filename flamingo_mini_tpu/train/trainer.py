"""FlamingoTrainer: jit-compiled training loop over a device mesh.

Replaces HF ``Trainer`` + DDP (/root/reference/training/train.py:95-190,
train.sh:26-37). Reference-parity pieces:

* AdamW with constant-after-warmup schedule (lr 1e-4, warmup 5000 — the
  train.sh:8-10 defaults);
* only the trainable partition updates (freeze semantics from
  utils/params.trainable_mask == reference freeze_lm/freeze_vm);
* checkpoint save/resume (Orbax; save_total_limit pruning);
* periodic captioning eval hook (the reference overrides Trainer.evaluate
  to run COCO captioning, train.py:102-123).

TPU-native: gradients sync via XLA-inserted psum over the mesh 'data' axis
(no DDP/NCCL code); bf16 compute with fp32 params + optimizer state; optional
TP via the sharding rules in parallel/sharding.py.
"""
from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configuration_flamingo import FlamingoConfig
from ..models import flamingo as F
from ..ops.layers import Policy
from ..parallel import create_mesh, param_shardings, shard_batch, shard_params
from ..utils import params as param_utils

logger = logging.getLogger("flamingo_mini_tpu.train")


@dataclass
class TrainingArguments:
    """Run configuration (the reference's FlamingoTrainingArguments +
    train.sh flag values; training/train.py:87-92, train.sh:6-27)."""

    output_dir: str = "/tmp/flamingo_run"
    learning_rate: float = 1e-4
    warmup_steps: int = 5000
    weight_decay: float = 0.0
    beta1: float = 0.9
    beta2: float = 0.999
    per_device_batch_size: int = 8
    sequence_length: int = 64
    num_epochs: int = 1
    max_steps: Optional[int] = None
    save_every_steps: Optional[int] = None
    save_total_limit: int = 2
    eval_every_steps: Optional[int] = 1000
    log_every_steps: int = 50
    seed: int = 42
    enable_dropout: bool = False   # frozen-trunk dropout (HF-Trainer parity)
    remat: bool = False            # rematerialize the forward (jax.checkpoint):
                                   # trade recompute FLOPs for activation memory
    tensor_parallel: bool = False
    mesh_shape: Optional[tuple] = None
    grad_clip_norm: Optional[float] = 1.0
    eval_coco_captioning_prefix: str = "<image>A picture of"
    eval_coco_captioning_start: int = 0
    eval_coco_captioning_end: int = 1000
    per_device_eval_batch_size: int = 64
    report_to: str = "jsonl"       # "jsonl" | "wandb" | "none" (train.sh:25)
    run_name: Optional[str] = None


def constant_with_warmup(lr: float, warmup_steps: int):
    """The reference's schedule: linear warmup then constant
    (train.sh:10 'constant_with_warmup'), HF-exact: lr(step) =
    lr * step / warmup_steps for step < warmup (so step 0 has lr 0), then
    constant — matching get_constant_schedule_with_warmup."""
    def schedule(step):
        return lr * jnp.where(step < warmup_steps,
                              step / max(warmup_steps, 1), 1.0)
    return schedule


class FlamingoTrainer:
    def __init__(
        self,
        model,                                  # FlamingoModel
        args: TrainingArguments,
        train_dataset=None,
        eval_fn: Optional[Callable[["FlamingoTrainer"], Dict[str, float]]] = None,
        collator=None,
        eval_dataset=None,      # indexable of (image, List[str] references) —
                                # the reference's COCO *val* split
                                # (training/train.py:160-168, eval.py:27-62)
        processor=None,         # needed for eval captioning; defaults to
                                # collator.processor
    ):
        self.model = model
        self.args = args
        self.train_dataset = train_dataset
        self.eval_fn = eval_fn
        self.collator = collator
        self.eval_dataset = eval_dataset
        self.processor = processor if processor is not None else \
            getattr(collator, "processor", None)
        from .metrics import MetricsLogger
        self.metrics = MetricsLogger(
            report_to=args.report_to, output_dir=args.output_dir,
            run_name=args.run_name,
            config={f: getattr(args, f) for f in (
                "learning_rate", "warmup_steps", "per_device_batch_size",
                "sequence_length", "tensor_parallel")})
        self.config: FlamingoConfig = model.config
        self.policy: Policy = model.policy

        self.mesh = create_mesh(args.mesh_shape)
        self.mask = model.trainable_mask()
        self.trainable, self.frozen = param_utils.partition_params(
            model.params, self.mask)

        sched = constant_with_warmup(args.learning_rate, args.warmup_steps)
        tx = [optax.clip_by_global_norm(args.grad_clip_norm)] \
            if args.grad_clip_norm else []
        tx.append(optax.adamw(sched, b1=args.beta1, b2=args.beta2,
                              weight_decay=args.weight_decay))
        self.optimizer = optax.chain(*tx)
        self.step = 0

        # Place BOTH partitions on the mesh. The frozen LM/vision trunk is
        # where virtually all the parameter memory lives, so under TP it must
        # be sharded too — placing only the trainable slice would leave the
        # trunk replicated and give no memory scaling.
        shardings = param_shardings(model.params, self.mesh,
                                    tensor_parallel=args.tensor_parallel)
        self.trainable = shard_params(self.trainable,
                                      _mask_tree(shardings, self.trainable))
        self.frozen = shard_params(self.frozen,
                                   _mask_tree(shardings, self.frozen))
        # init AFTER placement so adam mu/nu inherit the param shardings
        self.opt_state = self.optimizer.init(self.trainable)
        self._train_step = self._build_train_step()

    # ------------------------------------------------------------------
    def _build_train_step(self):
        config, policy = self.config, self.policy
        optimizer = self.optimizer

        enable_dropout = self.args.enable_dropout

        def loss_fn(trainable, frozen, batch, rng):
            params = param_utils.merge_params(trainable, frozen)
            out = F.forward(
                params, config, batch["input_ids"], policy=policy,
                media_locations=batch["media_locations"],
                attention_mask=batch["attention_mask"],
                pixel_values=batch["pixel_values"],
                labels=batch["labels"],
                dropout_rng=rng if enable_dropout else None)
            return out.loss

        if self.args.remat:
            # rematerialize: drop activations in the forward, recompute them
            # in the backward — trades FLOPs for HBM (jax.checkpoint)
            loss_fn = jax.checkpoint(loss_fn)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(trainable, opt_state, frozen, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, frozen, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return trainable, opt_state, loss

        return train_step

    # ------------------------------------------------------------------
    def train_step_on(self, batch: Dict[str, np.ndarray]) -> float:
        """One optimization step on a host batch. Gradient sync across the
        mesh 'data' axis is inserted by XLA (replicated-param + sharded-batch
        layout -> psum at the jit boundary)."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        batch["pixel_values"] = self.policy.cast(batch["pixel_values"])
        n_data = self.mesh.devices.shape[0]
        if len(self.mesh.devices.flat) > 1:
            b = batch["input_ids"].shape[0]
            if b % n_data != 0:
                raise ValueError(
                    f"global batch size {b} must be divisible by the mesh "
                    f"'data' axis ({n_data}); adjust per_device_batch_size")
            batch = shard_batch(batch, self.mesh)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.args.seed), self.step)
        with jax.set_mesh(self.mesh):
            self.trainable, self.opt_state, loss = self._train_step(
                self.trainable, self.opt_state, self.frozen, batch, rng)
        self.step += 1
        return float(loss)

    def evaluate(self) -> Dict[str, float]:
        """COCO-captioning evaluation on the held-out eval_dataset (the
        reference overrides Trainer.evaluate the same way,
        training/train.py:102-123); ``eval_fn`` takes precedence when given."""
        if self.eval_fn is not None:
            return self.eval_fn(self)
        if self.eval_dataset is None or self.processor is None:
            raise ValueError("evaluate() needs eval_dataset + processor "
                             "(or an eval_fn)")
        from .eval import evaluate_image_captioning
        self.params  # sync trained weights back into the model
        args = self.args
        metrics = evaluate_image_captioning(
            self.eval_dataset, self.model, self.processor,
            prefix=args.eval_coco_captioning_prefix,
            start=args.eval_coco_captioning_start,
            end=args.eval_coco_captioning_end,
            batch_size=args.per_device_eval_batch_size)
        return {f"eval_{k}": v for k, v in metrics.items()}

    def train(self, resume_from_checkpoint: Optional[str] = None):
        from .data import batches, prefetch_to_device
        if resume_from_checkpoint:
            self.load_checkpoint(resume_from_checkpoint)
        args = self.args
        sched = constant_with_warmup(args.learning_rate, args.warmup_steps)
        t0 = time.time()
        losses = []
        can_eval = (self.eval_fn is not None
                    or (self.eval_dataset is not None
                        and self.processor is not None))
        for epoch in range(args.num_epochs):
            epoch_batches = batches(self.train_dataset, self.collator,
                                    args.per_device_batch_size
                                    * max(1, len(self.mesh.devices.flat)),
                                    seed=args.seed + epoch)
            # async-transfer batch i+1 while batch i computes — on
            # remote-attached devices the raw transfer exceeds the step
            # itself (BENCH.md "training throughput")
            for batch in prefetch_to_device(epoch_batches,
                                            cast_pixels=self.policy.cast,
                                            mesh=self.mesh):
                loss = self.train_step_on(batch)
                losses.append(loss)
                if self.step % args.log_every_steps == 0:
                    self.metrics.log({
                        "loss": float(np.mean(losses[-args.log_every_steps:])),
                        "learning_rate": float(sched(self.step - 1)),
                        "epoch": epoch,
                        "s_per_it": (time.time() - t0) / max(1, len(losses)),
                    }, step=self.step)
                if args.save_every_steps and self.step % args.save_every_steps == 0:
                    self.save_checkpoint()
                if (args.eval_every_steps and can_eval
                        and self.step % args.eval_every_steps == 0):
                    metrics = self.evaluate()
                    self.metrics.log(metrics, step=self.step)
                if args.max_steps and self.step >= args.max_steps:
                    self.save_checkpoint()
                    self.metrics.finish()
                    return losses
        self.save_checkpoint()
        self.metrics.finish()
        return losses

    # ------------------------------------------------------------------
    @property
    def params(self):
        """Merged (trainable + frozen) params — sync'd back to the model."""
        merged = param_utils.merge_params(self.trainable, self.frozen)
        self.model.params = merged
        return merged

    def save_checkpoint(self, path: Optional[str] = None):
        import orbax.checkpoint as ocp
        path = path or os.path.join(self.args.output_dir,
                                    f"checkpoint-{self.step}")
        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.join(path, "trainable"),
                  _strip_none(self.trainable), force=True)
        ckpt.save(os.path.join(path, "opt_state"),
                  jax.tree_util.tree_map(lambda x: x, self.opt_state), force=True)
        ckpt.wait_until_finished()
        with open(os.path.join(path, "step.txt"), "w") as f:
            f.write(str(self.step))
        self._prune_checkpoints()
        logger.info("saved checkpoint %s", path)

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        restored = ckpt.restore(os.path.join(path, "trainable"),
                                _strip_none(self.trainable))
        self.trainable = _unstrip_none(self.trainable, restored)
        self.opt_state = ckpt.restore(os.path.join(path, "opt_state"),
                                      self.opt_state)
        with open(os.path.join(path, "step.txt")) as f:
            self.step = int(f.read().strip())
        logger.info("resumed from %s at step %d", path, self.step)

    def _prune_checkpoints(self):
        """Keep the newest ``save_total_limit`` checkpoints
        (reference --save_total_limit 2; train.sh:20)."""
        import re
        import shutil
        out = self.args.output_dir
        if not os.path.isdir(out):
            return
        ckpts = sorted(
            (d for d in os.listdir(out) if re.fullmatch(r"checkpoint-\d+", d)),
            key=lambda d: int(d.split("-")[1]))
        for d in ckpts[:-self.args.save_total_limit]:
            shutil.rmtree(os.path.join(out, d), ignore_errors=True)


def _mask_tree(shardings, like):
    """Subset the sharding tree to the structure of ``like`` (with Nones)."""
    return jax.tree_util.tree_map(
        lambda l, s: s if l is not None else None, like, shardings,
        is_leaf=lambda x: x is None)


def _strip_none(tree):
    if isinstance(tree, dict):
        out = {k: _strip_none(v) for k, v in tree.items()}
        return {k: v for k, v in out.items() if v is not None}
    if isinstance(tree, (list, tuple)):
        return [_strip_none(v) for v in tree]
    return tree


def _unstrip_none(template, restored):
    if isinstance(template, dict):
        return {k: (_unstrip_none(v, restored[k]) if k in restored else None)
                if v is not None or k in restored else None
                for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        return [_unstrip_none(t, r) for t, r in zip(template, restored)]
    return restored
