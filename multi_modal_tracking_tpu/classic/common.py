"""Shared helpers for the classic (pytracking-style) trackers.

ATOM and DiMP use the identical protected-ring sample memory
(pytracking update_memory/update_sample_weights semantics: the augmented
init samples are never overwritten, the ring wraps over the remaining
slots, weights decay exponentially with the new sample entering at lr —
boosted on hard negatives — and slot 0 stays anchored at >= 0.25), and the
same checkpoint-tree plumbing around utils.torch_convert.convert_dimpnet.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.classic.dcf import (FLAG_HARD_NEGATIVE,
                                                  FLAG_NORMAL, FLAG_NOT_FOUND,
                                                  FLAG_UNCERTAIN)

FLAG_NAMES = {FLAG_NORMAL: "normal", FLAG_NOT_FOUND: "not_found",
              FLAG_UNCERTAIN: "uncertain",
              FLAG_HARD_NEGATIVE: "hard_negative"}


def protected_ring_insert(mem_ptr, update_ok, flag, pairs, weights, *,
                          memory_size: int, n_protected: int,
                          learning_rate: float,
                          hard_negative_learning_rate: float):
    """One gated memory insert (pytracking update_memory).

    mem_ptr   : int32 scalar — monotone insert counter
    update_ok : bool scalar — whole insert is a no-op when False
    flag      : int32 localisation flag (hard negatives boost lr)
    pairs     : [(stored (M, ...), new (...)), ...] payloads to insert
    weights   : (M,) sample weights

    Returns (new_payloads list, new_weights, new_mem_ptr).
    """
    M, A = memory_size, n_protected
    ptr = jnp.where(mem_ptr < M, mem_ptr, A + (mem_ptr - M) % (M - A))
    outs = []
    for stored, new in pairs:
        upd = jax.lax.dynamic_update_index_in_dim(stored, new, ptr, 0)
        outs.append(jnp.where(update_ok, upd, stored))
    lr = jnp.where(flag == FLAG_HARD_NEGATIVE,
                   hard_negative_learning_rate, learning_rate)
    w = (weights * (1.0 - lr)).at[ptr].set(lr)
    w = w.at[0].max(0.25)                       # anchored init slot
    w = jnp.where(update_ok, w, weights)
    return outs, w, mem_ptr + update_ok.astype(jnp.int32)


def combine_nets(parts):
    """{'backbone': vars, ...} -> one {'params'|'batch_stats': {name: ...}}
    tree for utils.torch_convert.convert_dimpnet."""
    out = {}
    for name, v in parts.items():
        for coll, tree in v.items():
            out.setdefault(coll, {})[name] = tree
    return out


def split_nets(combined, names):
    """Inverse of combine_nets."""
    return {name: {coll: combined[coll][name]
                   for coll in combined if name in combined[coll]}
            for name in names}
