"""MixFormer-ViT: plain ViT backbone with asymmetric mixed attention.

Parity target: lib/models/mixformer_vit/mixformer.py —
  Attention.forward (:51-77): concat [template; online_template; search]
  token stream; template tokens attend only to the 2*Nt template tokens,
  search tokens attend to everything (two fused attention calls instead of a
  masked one — already the fastest formulation on TPU).
  forward_test (:79-93): search-only forward against per-block cached
  template k/v. set_online (:95-109): full self-attention over templates,
  caching per-block qkv.

TPU-first: the online template memory is an explicit pytree of per-block
(k, v) arrays threaded through jitted calls — no module state. Shapes are
static (online template count fixed by config).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from multi_modal_tracking_tpu.models.layers import Mlp, PatchEmbed, DropPath
from multi_modal_tracking_tpu.ops.pos_embed import get_2d_sincos_pos_embed


def _heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, N, C) -> (B, H, N, C/H)."""
    B, N, C = x.shape
    return x.reshape(B, N, num_heads, C // num_heads).transpose(0, 2, 1, 3)


def _merge(x: jax.Array) -> jax.Array:
    """(B, H, N, D) -> (B, N, C)."""
    B, H, N, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)


def _attend(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
            key_mask: Optional[jax.Array] = None) -> jax.Array:
    """Softmax attention on (B, H, N, D) tensors, f32 softmax accumulation.

    key_mask: optional (K,) or (B, K) {0,1} floats — masked keys get -inf
    logits (how the static template ring reproduces the reference's GROWING
    online-template buffer: unfilled slots exist in the tensors but never in
    the softmax)."""
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    attn = attn.astype(jnp.float32)
    if key_mask is not None:
        m = key_mask.astype(jnp.float32)
        m = m.reshape((m.shape[0] if m.ndim > 1 else 1, 1, 1, -1))
        attn = jnp.where(m > 0, attn, jnp.float32(-1e30))
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


class MixedAttention(nn.Module):
    """Asymmetric mixed attention over [t; ot; s] tokens."""
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype)
        self.proj = nn.Dense(self.dim, dtype=self.dtype)
        self.scale = (self.dim // self.num_heads) ** -0.5

    def _qkv(self, x):
        qkv = self.qkv(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _heads(q, self.num_heads), _heads(k, self.num_heads), _heads(v, self.num_heads)

    def __call__(self, x: jax.Array, n_mt: int) -> jax.Array:
        """x: (B, n_mt + n_s, C); templates attend within templates only.

        ops/attention.py runs the XLA two-call decomposition by default; the
        fused Pallas kernel exists but is explicit opt-in only (measured
        slower at flagship shapes — see use_pallas_default there)."""
        from multi_modal_tracking_tpu.ops.attention import mixed_attention
        B, N, C = x.shape
        q, k, v = self._qkv(x)
        out = mixed_attention(q, k, v, n_mt, self.scale)
        return self.proj(_merge(out))

    def set_online(self, x: jax.Array, key_mask: Optional[jax.Array] = None):
        """Full self-attention over template tokens; returns (out, (k, v))."""
        q, k, v = self._qkv(x)
        out = _merge(_attend(q, k, v, self.scale, key_mask))
        return self.proj(out), (k, v)

    def forward_test(self, x: jax.Array, mem: Tuple[jax.Array, jax.Array],
                     key_mask: Optional[jax.Array] = None) -> jax.Array:
        """Search-only attention against cached template k/v; key_mask covers
        the cached template keys (search keys are always live)."""
        q_s, k_s, v_s = self._qkv(x)
        k_mem, v_mem = mem
        k = jnp.concatenate([k_mem.astype(k_s.dtype), k_s], axis=2)
        v = jnp.concatenate([v_mem.astype(v_s.dtype), v_s], axis=2)
        full_mask = None
        if key_mask is not None:
            ones = jnp.ones((x.shape[0], k_s.shape[2]), key_mask.dtype) \
                if key_mask.ndim > 1 else jnp.ones((k_s.shape[2],),
                                                   key_mask.dtype)
            full_mask = jnp.concatenate(
                [jnp.broadcast_to(key_mask,
                                  key_mask.shape[:-1] + (k_mem.shape[2],)),
                 ones], axis=-1)
        return self.proj(_merge(_attend(q_s, k, v, self.scale, full_mask)))


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.attn = MixedAttention(self.dim, self.num_heads, self.qkv_bias, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)
        self.mlp = Mlp(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)
        self.dp1 = DropPath(self.drop_path)
        self.dp2 = DropPath(self.drop_path)

    def __call__(self, x, n_mt: int, deterministic: bool = True):
        x = x + self.dp1(self.attn(self.norm1(x), n_mt), deterministic)
        x = x + self.dp2(self.mlp(self.norm2(x)), deterministic)
        return x

    def set_online(self, x, key_mask=None):
        out, mem = self.attn.set_online(self.norm1(x), key_mask)
        x = x + out
        x = x + self.mlp(self.norm2(x))
        return x, mem

    def forward_test(self, x, mem, key_mask=None):
        x = x + self.attn.forward_test(self.norm1(x), mem, key_mask)
        x = x + self.mlp(self.norm2(x))
        return x


class MixFormerViT(nn.Module):
    """ViT backbone over [template; online_template; search] tokens.

    Config parity: base_patch16 (768/12/12) and large_patch16 (1024/24/16)
    per get_mixformer_vit (mixformer_vit/mixformer.py:252-266).
    """
    img_size_s: int = 288
    img_size_t: int = 128
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.patch_embed = PatchEmbed(self.patch_size, self.embed_dim, dtype=self.dtype)
        dpr = [float(r) for r in np.linspace(0, self.drop_path_rate, self.depth)]
        self.blocks = [
            Block(self.embed_dim, self.num_heads, self.mlp_ratio, self.qkv_bias,
                  drop_path=dpr[i], dtype=self.dtype, name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.grid_size_s = self.img_size_s // self.patch_size
        self.grid_size_t = self.img_size_t // self.patch_size
        self.pos_embed_s = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_s))[None]
        self.pos_embed_t = jnp.asarray(
            get_2d_sincos_pos_embed(self.embed_dim, self.grid_size_t))[None]

    def _embed_t(self, x):
        return self.patch_embed(x) + self.pos_embed_t.astype(self.dtype)

    def _embed_s(self, x):
        return self.patch_embed(x) + self.pos_embed_s.astype(self.dtype)

    def __call__(self, x_t, x_ot, x_s, deterministic: bool = True):
        """NHWC images -> (t_feat, ot_feat, s_feat) as (B, H, W, C) maps."""
        t = self._embed_t(x_t)
        ot = self._embed_t(x_ot)
        s = self._embed_s(x_s)
        n_t = t.shape[1]
        n_s = s.shape[1]
        x = jnp.concatenate([t, ot, s], axis=1)
        for blk in self.blocks:
            x = blk(x, 2 * n_t, deterministic)
        B = x.shape[0]
        gt, gs = self.grid_size_t, self.grid_size_s
        t, ot, s = x[:, :n_t], x[:, n_t:2 * n_t], x[:, 2 * n_t:]
        return (t.reshape(B, gt, gt, -1), ot.reshape(B, gt, gt, -1),
                s.reshape(B, gs, gs, -1))

    def set_online(self, x_t, x_ot, slot_mask=None):
        """x_t: (1, Ht, Wt, 3); x_ot: (n_ot, Ht, Wt, 3).

        slot_mask: optional (n_ot,) {0,1} — live ring slots. Masked slots are
        invisible to every attention (exactly the reference's grown buffer
        of the live slots; mixformer_cvt_online.py:152-168 grows one commit
        at a time).

        Returns (template_feat (1, gt, gt, C), mem: per-block (k, v),
        key_mask over the cached template tokens or None).
        """
        t = self._embed_t(x_t)
        ot = self._embed_t(x_ot)
        n_ot, n_t = ot.shape[0], t.shape[1]
        ot = ot.reshape(1, -1, ot.shape[-1])
        x = jnp.concatenate([t, ot], axis=1)
        key_mask = None
        if slot_mask is not None:
            key_mask = jnp.concatenate(
                [jnp.ones((n_t,), jnp.float32),
                 jnp.repeat(slot_mask.astype(jnp.float32), n_t)], axis=0)
        mem: List[Any] = []
        for blk in self.blocks:
            x, m = blk.set_online(x, key_mask)
            mem.append(m)
        gt = self.grid_size_t
        template = x[:, :n_t].reshape(1, gt, gt, -1)
        return template, mem, key_mask

    def forward_test(self, x_s, mem, key_mask=None):
        s = self._embed_s(x_s)
        for blk, m in zip(self.blocks, mem):
            s = blk.forward_test(s, m, key_mask)
        B = s.shape[0]
        gs = self.grid_size_s
        return s.reshape(B, gs, gs, -1)
