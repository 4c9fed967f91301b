"""SPM: Score Prediction Module.

Parity target: lib/models/mixformer_cvt/score_decoder.py:12-66 — a learnable
score token cross-attends first to the PrRoI-pooled search-box feature, then
to the template feature, followed by a 3-layer MLP producing a scalar
confidence logit. The RoI pooling uses the TPU-native closed-form
prroi_pool op (ops/prroi.py) instead of the CUDA extension.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.heads import MLPHead
from multi_modal_tracking_tpu.ops.prroi import prroi_pool


class ScoreDecoder(nn.Module):
    num_heads: int = 12
    hidden_dim: int = 768
    nlayer_head: int = 3
    pool_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, search_feat: jax.Array, template_feat: jax.Array,
                 search_box: jax.Array) -> jax.Array:
        """search_feat: (B, h, w, C); template_feat: (B, ht, wt, C);
        search_box: (B, 4) xyxy normalised to [0,1]. Returns (B, 1, 1) logits.
        """
        B, h, w, C = search_feat.shape
        nh = self.num_heads
        scale = self.hidden_dim ** -0.5

        bb = search_box * w                                    # feature-pixel coords
        rois = jnp.concatenate(
            [jnp.arange(B, dtype=jnp.float32)[:, None], bb.astype(jnp.float32)], axis=1)
        box_feat = prroi_pool(search_feat.astype(jnp.float32), rois,
                              self.pool_size, self.pool_size, 1.0)
        box_feat = box_feat.reshape(B, self.pool_size * self.pool_size, C).astype(self.dtype)
        tmpl = template_feat.reshape(B, -1, C)

        score_token = self.param("score_token", nn.initializers.truncated_normal(0.02),
                                 (1, 1, self.hidden_dim))
        x = jnp.broadcast_to(score_token, (B, 1, self.hidden_dim)).astype(self.dtype)
        # eps 1e-5: plain nn.LayerNorm torch default (score_decoder.py:26-27)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)

        for i, mem in enumerate([box_feat, tmpl]):
            q = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_q_{i}")(x)
            k = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_k_{i}")(mem)
            v = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_v_{i}")(mem)
            q = q.reshape(B, 1, nh, -1).transpose(0, 2, 1, 3)
            k = k.reshape(B, -1, nh, q.shape[-1]).transpose(0, 2, 1, 3)
            v = v.reshape(B, -1, nh, q.shape[-1]).transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, 1, self.hidden_dim)
            o = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_{i}")(o)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(o)

        return MLPHead(self.hidden_dim, 1, self.nlayer_head, dtype=self.dtype,
                       name="score_head")(x)                   # (B, 1, 1)
