"""Bisect the flagship train-step per-chip temp memory (AOT, CPU backend).

The full-model AOT fit check (tests/test_flagship_aot.py) reports ~117 GB
of per-chip temps on the virtual (fsdp=4, tensor=2) mesh.  This lowers the
same jitted step at a ladder of configurations and prints XLA's memory
analysis for each, to attribute the temps:

  * batch scaling:      B=8 vs B=4 vs B=2       (activations ~ linear in B)
  * image count:        N_IMG=4 vs 1            (SD UNet + ViT workload)
  * seq length:         L=2048 vs 512           (LLM activations)
  * no image decoder:   drops SD UNet/VAE + MMFSNet from the graph

Also dumps the top-32 largest buffers from the buffer-assignment proto when
XLA_DUMP=1 (XLA_FLAGS=--xla_dump_to must point somewhere writable).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import dataclasses

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", "/root/.cache/jax_test_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from mm_interleaved_tpu.configs import flagship_config
from mm_interleaved_tpu.engine.optim import OptimConfig
from mm_interleaved_tpu.engine.trainer import Trainer, TrainerConfig
from mm_interleaved_tpu.models.mm_interleaved import MMInterleaved
from mm_interleaved_tpu.parallel.partition import make_mesh, params_shardings


def lower_one(tag, B, L, n_img, with_dec=True, enc_mini=None):
    mesh = make_mesh(data=1, fsdp=4, tensor=2)
    cfg = flagship_config(max_num_images=n_img, seq_len=L)
    if not with_dec:
        cfg = dataclasses.replace(cfg, image_decoder=None)
    if enc_mini is not None:
        cfg = dataclasses.replace(
            cfg,
            image_decoder=dataclasses.replace(
                cfg.image_decoder, vae_encode_mini_bs=enc_mini),
        )
    model = MMInterleaved(cfg)
    enc = cfg.visual.encoder.vit.image_size
    batch = dict(
        text_ids=jax.ShapeDtypeStruct((B, L), jnp.int32),
        image_tensors=jax.ShapeDtypeStruct((B, n_img, enc, enc, 3),
                                           jnp.float32),
        num_image_per_seq=jax.ShapeDtypeStruct((B,), jnp.int32),
        attention_mask=jax.ShapeDtypeStruct((B, L), jnp.int32),
    )
    extra = {}
    if with_dec:
        dec = cfg.image_decoder.image_size
        extra["image_tensors_dec"] = jax.ShapeDtypeStruct(
            (B, n_img, dec, dec, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r, b, e: model.init(r, **b, **e),
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch, extra,
    )
    shardings = params_shardings(shapes, mesh)
    abstract_vars = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        shapes, shardings,
    )
    trainer = Trainer(
        model,
        TrainerConfig(optim=OptimConfig(warmup_steps=10, total_steps=100),
                      max_steps=100, checkpoint_dir=None),
        mesh=mesh,
    )
    compiled = trainer.lower_step(abstract_vars, dict(batch, **extra)) \
        .compile()
    ma = compiled.memory_analysis()
    print(f"[{tag}] B={B} L={L} n_img={n_img} dec={with_dec}: "
          f"args={ma.argument_size_in_bytes/2**30:.2f} GB "
          f"temp={ma.temp_size_in_bytes/2**30:.2f} GB "
          f"out={ma.output_size_in_bytes/2**30:.2f} GB", flush=True)
    return compiled


which = os.environ.get("PROBE_CASES", "b8,b2,img1,l512,nodec").split(",")
if "b8" in which:
    lower_one("base", 8, 2048, 4)
if "b4" in which:
    lower_one("B4", 4, 2048, 4)
if "b2" in which:
    lower_one("B2", 2, 2048, 4)
if "img1" in which:
    lower_one("1img", 8, 2048, 1)
if "l512" in which:
    lower_one("L512", 8, 512, 4)
if "nodec" in which:
    lower_one("noSD", 8, 2048, 4, with_dec=False)
if "encmini4" in which:
    lower_one("encMini4", 8, 2048, 4, enc_mini=4)
