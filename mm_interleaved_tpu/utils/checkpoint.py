"""Checkpoint/variable loading helpers for the CLIs.

Covers the reference's `load_model_weights` role (`utils/misc.py:13-63`):
initialise from config, then overwrite from an orbax checkpoint (our native
format) or from converted HF weights.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def init_variables(model, model_cfg, seed: int = 0):
    example = _tiny_example(model_cfg)
    rngs = {
        "params": jax.random.PRNGKey(seed),
        "noise": jax.random.PRNGKey(seed + 1),
        "dropout": jax.random.PRNGKey(seed + 2),
    }
    return jax.jit(model.init)(rngs, **example)


def _tiny_example(cfg):
    import jax.numpy as jnp

    S = cfg.special
    ntok = cfg.num_img_token
    L = min(cfg.seq_len, max(ntok + 8, 32))
    row = [S.bos_token_id, S.soi_token_id] + [S.image_token_id] * ntok
    row += [5] * (L - len(row))
    ids = np.asarray([row], np.int32)
    enc = cfg.visual.encoder.vit.image_size
    batch = dict(
        text_ids=jnp.asarray(ids),
        image_tensors=jnp.zeros((1, cfg.max_num_images, enc, enc, 3),
                                jnp.float32),
        num_image_per_seq=jnp.ones((1,), jnp.int32),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
    )
    if cfg.image_decoder is not None:
        d = cfg.image_decoder.image_size
        batch["image_tensors_dec"] = jnp.zeros(
            (1, cfg.max_num_images, d, d, 3), jnp.float32
        )
    return batch


def load_variables(model, model_cfg, checkpoint: Optional[str] = None,
                   seed: int = 0):
    variables = init_variables(model, model_cfg, seed)
    if checkpoint:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(checkpoint, target=dict(
            params=variables, opt_state=None, step=0,
        ))
        variables = restored["params"]
    return variables
