"""Checkpoint save/load (atomic, epoch-numbered, keep-policy).

Parity target: lib/train/trainers/base_trainer.py — save_checkpoint
(:115-148: tmp file + atomic os.rename, '<Net>_ep%04d' naming, keep last 10
epochs + every 5th, process-0 only) and load_checkpoint (:150-228: latest /
by-epoch / by-path). Serialisation is flax msgpack of the full TrainState
pytree (params + opt_state + batch_stats + step), so resume restores the
optimizer exactly — the reference only persists the net (optimizer save is
commented out there); we keep both and also support net-only loads for
warm starts (base_trainer.py:230-272 load_state_dict).
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import numpy as np
from flax import serialization


def _ckpt_path(directory: str, name: str, epoch: int) -> str:
    return os.path.join(directory, f"{name}_ep{epoch:04d}.msgpack")


def save_checkpoint(directory: str, name: str, epoch: int, state: Any,
                    keep_last: int = 10, keep_every: int = 5) -> str:
    """Atomically write the state pytree; prune per keep-policy."""
    os.makedirs(directory, exist_ok=True)
    # Pull to host numpy before serialising.
    import jax
    host_state = jax.tree.map(np.asarray, state)
    path = _ckpt_path(directory, name, epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(host_state))
    os.rename(tmp, path)                       # atomic (base_trainer.py:141-148)

    for p in glob.glob(os.path.join(directory, f"{name}_ep*.msgpack")):
        m = re.search(r"_ep(\d+)\.msgpack$", p)
        if not m:
            continue
        ep = int(m.group(1))
        if ep <= epoch - keep_last and ep % keep_every != 0:
            try:
                os.remove(p)
            except OSError:
                pass
    return path


def latest_checkpoint(directory: str, name: str) -> Optional[str]:
    paths = [p for p in glob.glob(os.path.join(directory, f"{name}_ep*.msgpack"))
             if checkpoint_epoch(p) >= 0]     # ignore non-numeric suffixes
    if not paths:
        return None
    return max(paths, key=checkpoint_epoch)


def checkpoint_epoch(path: str) -> int:
    m = re.search(r"_ep(\d+)\.(?:msgpack|orbax)$", path.rstrip("/"))
    return int(m.group(1)) if m else -1


def latest_checkpoint_sharded(directory: str, name: str) -> Optional[str]:
    """Latest orbax (sharded) checkpoint dir written by
    save_checkpoint_sharded, by epoch number."""
    paths = glob.glob(os.path.join(directory, f"{name}_ep*.orbax"))
    if not paths:
        return None
    return max(paths, key=checkpoint_epoch)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into `target`'s structure."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_variables(path: str, target_variables: Any,
                   strict: bool = True) -> Any:
    """Net-only load: accepts a full TrainState checkpoint, a bare variables
    dict, or a PyTorch reference checkpoint (.pth/.pth.tar/.pt — converted
    key-by-key); returns variables matching target structure.

    strict=True (the default, matching the reference's eval-time
    load_state_dict(strict=True) — lib/test/tracker/asymmetric_shared_ce.py
    :18-19) raises if ANY target leaf would keep its random init or any
    checkpoint leaf has no/mis-shaped target — a wrong or stale checkpoint
    must fail loudly, never evaluate silently. strict=False restores the
    reference's warm-start semantics (base_trainer.py:230-272,
    asymmetric_shared_online.py:448-470): overlapping same-shape leaves load,
    the rest keep init with a printed report. Warm-start key EXPANSIONS
    (bare MAE backbone dicts, unimodal->RGBT duplication) are inherently
    partial, so detecting one downgrades to non-strict automatically."""
    if path.endswith((".pth", ".pth.tar", ".pt")):
        from multi_modal_tracking_tpu.utils.torch_convert import (
            convert_state_dict, expand_modality_lns, expand_two_stream,
            load_torch_state_dict)
        sd = load_torch_state_dict(path)
        warm_start = False        # an applied expansion implies partiality
        params = target_variables.get("params", {})
        # Bare backbone-pretrain dicts — MAE ViT (blocks.N/patch_embed,
        # asymmetric_shared_ce.py:515-533), ConvMAE (blocks1-3/patch_embed1-4,
        # mixformer_convmae/mixformer.py:409-421) and CvT-21 (stage0-2,
        # mixformer_cvt/mixformer.py:697-708) — carry no "backbone." prefix;
        # add it so the full-model key mapping lands them on the backbone.
        if not any(k.startswith(("backbone", "box_head")) for k in sd) and \
                any(k.startswith(("blocks.", "blocks1.", "patch_embed.",
                                  "patch_embed1.", "stage0.")) for k in sd):
            sd = {"backbone." + k: v for k, v in sd.items()}
            warm_start = True
        # RGB-unimodal -> RGBT warm starts need the reference's key
        # expansion (mixformer.py:447-460 backbone duplication;
        # asymmetric_shared_ce.py:649-661 norm1/norm2 -> _v/_i). Detect by
        # target structure vs checkpoint keys so trained RGBT checkpoints
        # (already expanded) pass through untouched.
        tgt_two_stream = "backbone_v" in params
        tgt_modal_lns = any("norm1_v" in blk for blk in
                            params.get("backbone", {}).values()
                            if isinstance(blk, dict))
        sd_unimodal = any(k.startswith("backbone.") for k in sd)
        if tgt_two_stream and sd_unimodal and \
                not any(k.startswith("backbone_v.") for k in sd):
            sd = expand_two_stream(sd)
            warm_start = True
        elif tgt_modal_lns and sd_unimodal and \
                not any(".norm1_v." in k for k in sd):
            sd = expand_modality_lns(sd)
            warm_start = True
        new_vars, _ = convert_state_dict(sd, target_variables,
                                         strict=strict and not warm_start)
        return new_vars
    with open(path, "rb") as f:
        raw = f.read()
    state_dict = serialization.msgpack_restore(raw)
    # unwrap trainer epoch envelopes ({"epoch", "state"}) and the reference's
    # {"net": state_dict} convention (base_trainer.py:115-148)
    for key in ("state", "net"):
        if isinstance(state_dict, dict) and key in state_dict and \
                "params" not in state_dict:
            state_dict = state_dict[key]
    if "params" in state_dict and "opt_state" in state_dict:   # TrainState
        out = dict(target_variables)
        out["params"] = _partial_from_state_dict(
            target_variables["params"], state_dict["params"], path,
            strict=strict)
        if state_dict.get("batch_stats") is not None and "batch_stats" in target_variables:
            out["batch_stats"] = _partial_from_state_dict(
                target_variables["batch_stats"], state_dict["batch_stats"],
                path, strict=strict)
        return out
    return _partial_from_state_dict(target_variables, state_dict, path,
                                    strict=strict)


def _partial_from_state_dict(target, state, label="", strict=False):
    """from_state_dict with the reference's strict=False warm-start
    semantics (base_trainer.py:230-272, asymmetric_shared_online.py:448-470):
    leaves present in both (same shape) restore; target-only leaves keep
    their init (e.g. the stage-2 ScoreDecoder when loading a stage-1 tracker
    checkpoint); mismatches are reported, never silently dropped when the
    checkpoint covers everything (the exact-match case stays strict).

    strict=True turns any skipped target leaf or checkpoint-only key into a
    hard error (eval-time loads: load_state_dict(strict=True) parity)."""
    from flax import traverse_util
    t_flat = traverse_util.flatten_dict(serialization.to_state_dict(target))
    s_flat = traverse_util.flatten_dict(state)
    merged, skipped = {}, []
    n_loaded = 0
    for k, v in t_flat.items():
        sv = s_flat.get(k)
        if sv is not None and tuple(np.shape(sv)) == tuple(np.shape(v)):
            merged[k] = sv
            n_loaded += 1
        else:
            merged[k] = v
            skipped.append("/".join(map(str, k)))
    unexpected = [k for k in s_flat if k not in t_flat]
    if skipped or unexpected:
        msg = (f"restore{f' of {label}' if label else ''}: "
               f"{n_loaded}/{len(t_flat)} leaves loaded; missing/mis-shaped "
               f"{skipped[:4]}{'...' if len(skipped) > 4 else ''}; "
               f"{len(unexpected)} checkpoint-only keys")
        if strict:
            raise ValueError(
                "strict " + msg + " — the checkpoint does not match the "
                "model (wrong script/config/stage?); pass strict=False only "
                "for training warm starts")
        print("partial " + msg + " ignored")
    return serialization.from_state_dict(target,
                                         traverse_util.unflatten_dict(merged))


def save_checkpoint_sharded(directory: str, name: str, epoch: int,
                            state: Any) -> str:
    """Orbax save of a (possibly FSDP-/TP-sharded) TrainState WITHOUT
    gathering to one host: every process writes only the shards it owns, so
    multi-host FSDP states larger than one host's RAM checkpoint fine.
    Complements the msgpack path (save_checkpoint) — use that for small
    replicated states; this for sharded/multi-host ones."""
    import orbax.checkpoint as ocp
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(os.path.abspath(directory), f"{name}_ep{epoch:04d}.orbax")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    return path


def load_checkpoint_sharded(path: str, target: Any, shardings: Any = None) -> Any:
    """Orbax restore straight INTO the given shardings (each process reads
    only its shards). `target` supplies structure/dtypes; `shardings` a
    matching pytree of jax.sharding.Sharding (e.g. fsdp_shardings) — None
    restores to host numpy."""
    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    if shardings is None:
        return ckptr.restore(path, item=target)
    restore_args = jax.tree.map(
        lambda x, s: ocp.ArrayRestoreArgs(sharding=s, global_shape=x.shape,
                                          dtype=x.dtype)
        if hasattr(x, "shape") else ocp.RestoreArgs(),
        target, shardings)
    return ckptr.restore(path, item=target, restore_args=restore_args)


def cast_floating(variables: Any, dtype) -> Any:
    """Cast every floating-point leaf of a variables pytree to `dtype`.

    Inference-time use: models built with dtype=bf16 cast their f32 params to
    bf16 at every use anyway (flax promotion), so pre-casting is numerically
    identical while halving the per-forward weight HBM traffic — ViT-B reads
    all ~86M params once per tracking step. Only the 'params' collection is
    cast; batch_stats (and any other state) stay in their stored dtype."""
    import jax
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    if isinstance(variables, dict) and "params" in variables:
        out = dict(variables)
        out["params"] = jax.tree_util.tree_map(cast, variables["params"])
        return out
    return jax.tree_util.tree_map(cast, variables)
