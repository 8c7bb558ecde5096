"""stream_ops vs direct numpy re-implementations of the reference loops
(`mm_interleaved.py:144-406`)."""

import numpy as np
import jax.numpy as jnp

from mm_interleaved_tpu.models import stream_ops as so

BOS, EOS, PAD, SOI, IMG = 1, 2, 0, 90, 91
SPECIAL = dict(
    bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
    soi_token_id=SOI, image_token_id=IMG,
)
NTOK = 4  # image tokens per image


def build_row(L, docs):
    """docs: list of lists of tokens ('I' = image block)."""
    row = []
    for doc in docs:
        row.append(BOS)
        for t in doc:
            if t == "I":
                row.extend([SOI] + [IMG] * NTOK)
            else:
                row.append(t)
    row = row[:L] + [PAD] * max(0, L - len(row))
    return row


def example_batch(L=28, max_img=3):
    rows = [
        build_row(L, [[5, 6, "I", 7], [8, "I", 9, 10]]),
        build_row(L, [[11, "I", 12, 13, 14]]),
    ]
    ids = np.array(rows, dtype=np.int32)
    n_img = np.array([2, 1], dtype=np.int32)
    return ids, n_img, max_img


def test_token_positions():
    ids, n_img, max_img = example_batch()
    got = np.asarray(so.token_positions(jnp.array(ids), SOI, max_img))
    for b in range(ids.shape[0]):
        want = np.where(ids[b] == SOI)[0]
        for k in range(max_img):
            if k < len(want):
                assert got[b, k] == want[k]
            else:
                assert got[b, k] == ids.shape[1]


def test_nearest_bos():
    ids, _, _ = example_batch()
    got = np.asarray(so.nearest_bos_positions(jnp.array(ids), BOS))
    B, L = ids.shape
    for b in range(B):
        last = -1
        for t in range(L):
            if ids[b, t] == BOS:
                last = t
            assert got[b, t] == last


def test_cross_attention_mask_matches_reference_loop():
    ids, n_img, max_img = example_batch()
    B, L = ids.shape
    mask, soi_pos = so.mm_cross_attention_mask(
        jnp.array(ids), jnp.array(n_img), SOI, BOS, max_img
    )
    mask = np.asarray(mask)

    # reference loop (mm_interleaved.py:195-221)
    want = np.zeros((B, L, max_img), dtype=np.int32)
    for b in range(B):
        soi = np.where(ids[b] == SOI)[0]
        last_bos = -1
        bos_at = []
        for t in range(L):
            if ids[b, t] == BOS:
                last_bos = t
            bos_at.append(last_bos)
        for k in range(min(len(soi), max_img)):
            if k >= n_img[b]:
                continue
            ip = soi[k] + 1
            for t in range(L):
                if ip > bos_at[t] and ip <= t:
                    want[b, t, k] = 1
    np.testing.assert_array_equal(mask, want)


def test_scatter_image_embeds():
    ids, n_img, max_img = example_batch()
    B, L = ids.shape
    C = 8
    rng = np.random.RandomState(0)
    text_embeds = rng.randn(B, L, C).astype(np.float32)
    vis = rng.randn(B, max_img, NTOK, C).astype(np.float32)
    out = np.asarray(
        so.scatter_image_embeds(
            jnp.array(text_embeds), jnp.array(ids), jnp.array(vis), IMG
        )
    )
    for b in range(B):
        j = 0
        for t in range(L):
            if ids[b, t] == IMG:
                np.testing.assert_array_equal(out[b, t], vis[b, j // NTOK, j % NTOK])
                j += 1
            else:
                np.testing.assert_array_equal(out[b, t], text_embeds[b, t])


def test_context_windows():
    ids, n_img, max_img = example_batch()
    B, L = ids.shape
    C = 4
    hidden = np.random.RandomState(1).randn(B, L, C).astype(np.float32)
    soi_pos = so.token_positions(jnp.array(ids), SOI, max_img)
    near_bos = so.nearest_bos_positions(jnp.array(ids), BOS)
    ctx, cmask = so.context_windows(
        jnp.array(hidden), soi_pos, near_bos, jnp.array(n_img), max_ctx=12
    )
    ctx, cmask = np.asarray(ctx), np.asarray(cmask)
    for b in range(B):
        soi = np.where(ids[b] == SOI)[0]
        for k in range(max_img):
            if k >= n_img[b] or k >= len(soi):
                assert cmask[b, k].sum() == 0
                continue
            s = soi[k]
            bos = max([t for t in range(s + 1) if ids[b, t] == BOS])
            length = s - bos + 1
            assert cmask[b, k].sum() == min(length, 12)
            window = hidden[b, bos : s + 1][::-1]  # reversed
            np.testing.assert_array_equal(ctx[b, k, : min(length, 12)],
                                          window[:12])


def test_previous_image_mask():
    ids, n_img, max_img = example_batch()
    B, L = ids.shape
    soi_pos = so.token_positions(jnp.array(ids), SOI, max_img)
    near_bos = so.nearest_bos_positions(jnp.array(ids), BOS)
    got = np.asarray(
        so.previous_image_mask(soi_pos, near_bos, jnp.array(n_img), L)
    )
    # row 0: image 1 is in a new document (new <bos>), so no previous image
    assert got[0, 0] == 0
    assert got[0, 1] == 0  # doc boundary between image 0 and 1
    assert got[1].sum() == 0  # row 1 has a single image

    # same-document multi-image case
    ids2 = np.array([build_row(28, [[5, "I", 6, "I", 7]])], dtype=np.int32)
    soi2 = so.token_positions(jnp.array(ids2), SOI, 3)
    nb2 = so.nearest_bos_positions(jnp.array(ids2), BOS)
    got2 = np.asarray(
        so.previous_image_mask(soi2, nb2, jnp.array([2]), 28)
    )
    assert got2[0, 0] == 0 and got2[0, 1] == 1


def test_gt_text_ids_masking():
    ids, n_img, max_img = example_batch()
    att = (ids != PAD).astype(np.int32)
    gt = np.asarray(
        so.prepare_gt_text_ids(jnp.array(ids), jnp.array(att), SPECIAL)
    )
    B, L = ids.shape
    for b in range(B):
        for t in range(L - 1):
            nxt = ids[b, t + 1]
            expect_ignore = (
                nxt in (PAD, IMG, BOS)
                or att[b, t + 1] == 0
                or (ids[b, t] == BOS and nxt == SOI)
            )
            if expect_ignore:
                assert gt[b, t] == -100, (b, t, nxt)
            else:
                assert gt[b, t] == nxt


def test_cross_entropy_ignore():
    logits = jnp.array(np.random.RandomState(0).randn(2, 5, 7).astype(np.float32))
    labels = jnp.array([[1, 2, -100, 3, -100], [-100, -100, 0, 1, 2]])
    loss = so.cross_entropy_ignore(logits, labels)
    import torch
    import torch.nn.functional as F

    want = F.cross_entropy(
        torch.tensor(np.asarray(logits)).permute(0, 2, 1),
        torch.tensor(np.asarray(labels), dtype=torch.long),
        ignore_index=-100,
    )
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)
