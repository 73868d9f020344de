"""Worker for the 2-process multi-host test (test_multihost.py).

Launched twice with argv = (coordinator_port, process_id). Each process
exposes 2 virtual CPU devices; after ``distributed_init`` the global mesh
spans 4 devices across the two processes. Proves C25's DCN surface
(``training/train.py --coordinator`` -> ``parallel.mesh.distributed_init``)
actually coordinates: a cross-process psum, then one real FlamingoTrainer
step over the global data mesh.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    port, pid = int(sys.argv[1]), int(sys.argv[2])
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from flamingo_mini_tpu.parallel.mesh import create_mesh, distributed_init

    distributed_init(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    # cross-process collective: psum over the global data axis
    mesh = create_mesh((4,), axis_names=("data",))
    s = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(
        s, np.full((2, 8), float(pid + 1), np.float32), (4, 8))

    @jax.jit
    def total(v):
        return jnp.sum(v)

    tot = float(total(x))
    assert tot == (1.0 + 2.0) * 2 * 8, tot  # both processes' shards summed
    print(f"PSUM_OK {tot}", flush=True)

    # one real trainer step over the global mesh
    from flamingo_mini_tpu import FlamingoConfig, FlamingoModel
    from flamingo_mini_tpu.flamingo_processor import FlamingoProcessor
    from flamingo_mini_tpu.tokenizer import build_toy_tokenizer
    from flamingo_mini_tpu.train.data import (DataCollator,
                                              SyntheticCaptionDataset)
    from flamingo_mini_tpu.train.trainer import (FlamingoTrainer,
                                                 TrainingArguments)

    cfg = FlamingoConfig(
        lm="gpt2", dim=32, dim_visual=32, xattn_every=2, xattn_dim_head=8,
        xattn_heads=4, resampler_depth=1, resampler_dim_head=8,
        resampler_heads=4, resampler_num_latents=4,
        lm_arch_overrides=dict(vocab_size=256, n_positions=64, n_embd=32,
                               n_layer=2, n_head=4),
        vision_arch_overrides=dict(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1, num_attention_heads=4,
                                   image_size=32, patch_size=8))
    model = FlamingoModel(cfg, rng=jax.random.PRNGKey(0))
    tok = build_toy_tokenizer(["image", "a", "cat", "dog", "picture", "of"])
    proc = FlamingoProcessor(cfg, tokenizer=tok)
    ds = SyntheticCaptionDataset(size=8, image_hw=32)
    col = DataCollator(proc, length=16)
    args = TrainingArguments(
        output_dir=f"/tmp/flamingo_multihost_{pid}", learning_rate=1e-3,
        warmup_steps=1, per_device_batch_size=2, max_steps=1,
        log_every_steps=100, eval_every_steps=None, save_every_steps=None,
        mesh_shape=(4, 1))
    trainer = FlamingoTrainer(model, args, train_dataset=ds, collator=col)
    # global batch 8 = 4 devices x per-device 2; identical on both processes
    batch = col([ds[i] for i in range(8)])
    loss = trainer.train_step_on(batch)
    print(f"TRAIN_OK {float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main()
