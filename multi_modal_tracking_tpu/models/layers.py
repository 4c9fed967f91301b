"""Shared flax building blocks for the MixFormer model families.

Conventions (TPU-native):
  * images are NHWC, features maps (B, H, W, C), token sequences (B, N, C)
  * `dtype` = compute dtype (bf16 in production), params are f32
  * LayerNorm eps 1e-6 to match the reference builds
    (lib/models/mixformer_vit/mixformer.py:259 norm_layer partial)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer FFN (Dense -> GELU -> Dense), timm-Mlp semantics."""
    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu_exact(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        return x


class PatchEmbed(nn.Module):
    """Conv patchify: (B, H, W, C_in) -> (B, H/p * W/p, embed_dim)."""
    patch_size: int = 16
    embed_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        B, H, W, C = x.shape
        return x.reshape(B, H * W, C)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class ConvBNRelu(nn.Module):
    """3x3 conv + BatchNorm + ReLU tower stage of the corner heads.

    BatchNorm batch statistics are synchronised across the data mesh axis when
    `axis_name` is set (the TPU-native equivalent of the reference's
    SyncBatchNorm conversion, train_script_mixformer.py:105). `frozen=True`
    reproduces FrozenBatchNorm2d (mixformer_cvt/utils.py): affine transform
    with constant (non-updating) running stats.
    """
    features: int
    kernel_size: int = 3
    frozen: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        x = nn.Conv(self.features, kernel_size=(k, k), padding=k // 2, use_bias=True,
                    dtype=self.dtype, name="conv")(x)
        if self.frozen:
            # buffers, not params (reference FrozenBatchNorm2d): the affine
            # must not be trained or weight-decayed while "frozen"
            scale = self.variable("batch_stats", "bn_scale",
                                  lambda: jnp.ones((self.features,), jnp.float32))
            bias = self.variable("batch_stats", "bn_bias",
                                 lambda: jnp.zeros((self.features,), jnp.float32))
            mean = self.variable("batch_stats", "bn_mean",
                                 lambda: jnp.zeros((self.features,), jnp.float32))
            var = self.variable("batch_stats", "bn_var",
                                lambda: jnp.ones((self.features,), jnp.float32))
            inv = scale.value * jax.lax.rsqrt(var.value + 1e-5)
            x = x * inv.astype(x.dtype) + (bias.value - mean.value * inv).astype(x.dtype)
        else:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             axis_name=self.axis_name if train else None,
                             dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class LayerNorm(nn.LayerNorm):
    """LayerNorm with the reference eps default."""
    epsilon: float = 1e-6


def merge_template_search(inp_list, return_search: bool = False,
                          return_template: bool = False):
    """STARK-style sequence-dict merge (lib/utils/merge.py:4-15): concatenate
    per-source {feat (L, B, C), mask (B, L), pos (L, B, C)} dicts along the
    sequence axis; the search-region entry must be last."""
    seq = {"feat": jnp.concatenate([x["feat"] for x in inp_list], axis=0),
           "mask": jnp.concatenate([x["mask"] for x in inp_list], axis=1),
           "pos": jnp.concatenate([x["pos"] for x in inp_list], axis=0)}
    if return_search:
        x = inp_list[-1]
        seq.update({"feat_x": x["feat"], "mask_x": x["mask"], "pos_x": x["pos"]})
    if return_template:
        z = inp_list[0]
        seq.update({"feat_z": z["feat"], "mask_z": z["mask"], "pos_z": z["pos"]})
    return seq


def get_qkv(inp_list):
    """q from the search entry (feat+pos), k/v from the concatenation of all
    entries (lib/utils/merge.py:18-29). Returns (q, k, v, key_padding_mask)."""
    dict_x = inp_list[-1]
    cat = merge_template_search(inp_list)
    q = dict_x["feat"] + dict_x["pos"]
    k = cat["feat"] + cat["pos"]
    v = cat["feat"]
    return q, k, v, cat["mask"]
