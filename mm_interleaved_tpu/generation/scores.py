"""Option ranking — `generate_scores` (reference mm_interleaved.py:666-743).

For each context + candidate option, run the full forward and sum the
log-probabilities of the option tokens; used by VisDial NDCG ranking
(`lmm_trainer.py:1812-1912`).  Options fold into the batch axis; a python
chunk loop bounds peak memory (the reference's ``mini_bs=4``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def generate_scores(
    model,
    variables,
    text_ids: jax.Array,  # [B, L] shared context (right-padded is fine)
    options_ids: jax.Array,  # [B, n_opt, Lo]
    options_mask: jax.Array,  # [B, n_opt, Lo] 1 = real option token
    image_tensors: jax.Array,  # [B, max_img, H, W, 3]
    num_image_per_seq: jax.Array,  # [B]
    attention_mask: jax.Array,  # [B, L]
    mini_bs: int = 4,
) -> np.ndarray:
    """Returns [B, n_opt] option log-prob scores."""
    B, L = text_ids.shape
    n_opt, Lo = options_ids.shape[1], options_ids.shape[2]

    full_ids = jnp.concatenate(
        [
            jnp.repeat(text_ids[:, None], n_opt, axis=1),
            options_ids,
        ],
        axis=2,
    ).reshape(B * n_opt, L + Lo)
    full_mask = jnp.concatenate(
        [
            jnp.repeat(attention_mask[:, None], n_opt, axis=1),
            options_mask,
        ],
        axis=2,
    ).reshape(B * n_opt, L + Lo)
    imgs = jnp.repeat(image_tensors, n_opt, axis=0)
    n_img = jnp.repeat(num_image_per_seq, n_opt, axis=0)

    @jax.jit
    def score_chunk(ids, mask, imgs, n_img):
        prep = model.apply(
            variables, ids, imgs, n_img, method=model.prepare_mm_embeds,
        )
        hidden, _ = model.apply(
            variables, prep["mm_embeds"], mask, prep["mmfs_values"],
            prep["cross_attention_mask"],
            method=lambda m, *a: m.mm_decoder(*a),
        )
        logits = model.apply(
            variables, hidden, method=lambda m, h: m.text_decoder(h)
        )
        # option token t (position L+t) is predicted at position L+t-1
        opt_logits = logits[:, L - 1 : L + Lo - 1].astype(jnp.float32)
        logp = jax.nn.log_softmax(opt_logits, axis=-1)
        opt_ids = ids[:, L : L + Lo]
        tok_logp = jnp.take_along_axis(
            logp, opt_ids[..., None], axis=-1
        )[..., 0]
        opt_m = mask[:, L : L + Lo].astype(jnp.float32)
        return (tok_logp * opt_m).sum(axis=-1)

    scores = []
    total = B * n_opt
    step = max(1, mini_bs)
    for i in range(0, total, step):
        j = min(i + step, total)
        # pad the tail chunk to the fixed mini batch to avoid a recompile
        sl = slice(i, j)
        pad = step - (j - i)
        ids_c = jnp.pad(full_ids[sl], ((0, pad), (0, 0)))
        mask_c = jnp.pad(full_mask[sl], ((0, pad), (0, 0)))
        imgs_c = jnp.pad(imgs[sl], ((0, pad),) + ((0, 0),) * 4)
        n_img_c = jnp.pad(n_img[sl], (0, pad), constant_values=1)
        s = score_chunk(ids_c, mask_c, imgs_c, n_img_c)
        scores.append(np.asarray(s)[: j - i])
    return np.concatenate(scores).reshape(B, n_opt)
