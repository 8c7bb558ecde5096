"""InceptionV3 feature extractor for FID — native flax port.

Port of the reference's pytorch-FID InceptionV3 (`utils/inception.py`,
itself the torchvision InceptionV3 with FID-specific pooling): the 2048-d
pool3 features feed `utils/fid.py`.  Includes a converter from a torchvision
``inception_v3`` state dict (the standard FID weights file
``pt_inception-2015-12-05`` uses the same layout).

Input convention matches pytorch-FID: images in [0, 1], resized to 299x299
(bilinear), normalised to [-1, 1].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


class BasicConv2d(nn.Module):
    out_ch: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         use_scale=True, use_bias=True, name="bn")(x)
        return nn.relu(x)


def _pad(k):
    return ((k // 2, k // 2), (k // 2, k // 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(5), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_3")(b3)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3),
                         count_include_pad=False)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(3), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3),
                         count_include_pad=False)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(3),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(3),
                             count_include_pad=False)
        else:  # pytorch-FID's final block uses max pool
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=_pad(3))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Input [B, H, W, 3] in [0, 1] -> pool3 features [B, 2048]."""

    resize_input: bool = True
    fid_final_block: bool = True  # pytorch-FID's max-pool InceptionE_2

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        if self.resize_input:
            x = jax.image.resize(x, (B, 299, 299, 3), "bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(3), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_final_block else "avg",
                       name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # global avg pool -> [B, 2048]


def convert_torchvision_inception(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision `inception_v3` state dict -> flax params/batch_stats."""
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] in ("AuxLogits", "fc"):
            continue
        *mod, pname = parts
        # torch module path "Mixed_5b.branch1x1.conv.weight"
        flax_mod = mod[:-1] + [mod[-1]]
        v = np.asarray(val)
        if pname == "weight" and mod[-1] == "conv":
            put(params, flax_mod + ["kernel"], np.transpose(v, (2, 3, 1, 0)))
        elif mod[-1] == "bn":
            if pname == "weight":
                put(params, flax_mod + ["scale"], v)
            elif pname == "bias":
                put(params, flax_mod + ["bias"], v)
            elif pname == "running_mean":
                put(stats, flax_mod + ["mean"], v)
            elif pname == "running_var":
                put(stats, flax_mod + ["var"], v)
    return {"params": params, "batch_stats": stats}
