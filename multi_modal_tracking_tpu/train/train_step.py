"""pjit-sharded train / val steps.

Parity targets: the reference's hot training loop
(lib/train/trainers/rgbt_trainer.py:61-115 cycle_dataset +
lib/train/actors/mixformer_rgbt.py:33-113): forward on bimodal crops,
CIoU+L1 (or BCE score) loss, grad clip, AdamW step — with DDP all-reduce
replaced by GSPMD: the step is jitted with the batch sharded over the 'data'
mesh axis and params replicated, so XLA emits the gradient reductions over
ICI automatically (SURVEY.md §2.6). AMP becomes the bf16 compute policy —
no loss scaler needed on TPU.

CE keep-rate is a static argument: the trainer quantises the cosine schedule
(lib/utils/ce_utils.py:71-83) into buckets so the bounded set of keep-lengths
triggers a bounded number of recompilations.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from multi_modal_tracking_tpu.train.losses import box_losses, score_loss


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Any
    step: jax.Array

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(params=params, opt_state=tx.init(params),
                   batch_stats=variables.get("batch_stats", {}),
                   step=jnp.int32(0))


def adjust_keep_rate(epoch: int, warmup_epochs: int, total_epochs: int,
                     iters_per_epoch: int, base_keep_rate: float = 0.5,
                     max_keep_rate: float = 1.0, iters: int = -1) -> float:
    """Cosine CE keep-rate schedule (ce_utils.py:71-83), host-side python."""
    if epoch < warmup_epochs:
        return 1.0
    if epoch >= total_epochs:
        return base_keep_rate
    if iters == -1:
        iters = epoch * iters_per_epoch
    total_iters = iters_per_epoch * (total_epochs - warmup_epochs)
    iters = iters - iters_per_epoch * warmup_epochs
    return base_keep_rate + (max_keep_rate - base_keep_rate) * \
        (math.cos(iters / total_iters * math.pi) + 1) * 0.5


def bucketize_keep_rate(rate: Optional[float], n_search: int, bucket: int = 16) -> Optional[float]:
    """Quantise a keep rate so ceil(rate*n_search) rounds UP to a multiple of
    `bucket` tokens — bounds recompiles to ~n_search/bucket graphs while never
    pruning more aggressively than the reference schedule."""
    if rate is None or rate >= 1.0:
        return rate
    keep = math.ceil(rate * n_search)
    keep_b = min(n_search, math.ceil(keep / bucket) * bucket)
    return keep_b / n_search


def make_train_step(model, tx, mesh=None, rgbt: bool = True,
                    iou_weight: float = 2.0, l1_weight: float = 5.0,
                    train_score: bool = False, score_weight: float = 1.0,
                    state_shardings=None):
    """Build a jitted (ce_keep_rate-static) train step.

    Batch dict (host, numpy/jnp):
      rgbt: template_v/i, online_template_v/i, search_v/i: (B, H, W, 3) f32
            normalised crops; gt_xywh: (B, 4); labels: (B,) for SPM stage.
      unimodal: template, online_template, search, gt_xywh (+labels).

    state_shardings: optional TrainState sharding pytree (e.g. built from
    parallel.mesh.param_shardings for tensor parallelism over a 2-D mesh);
    default replicates params and shards only the batch on the 'data' axis.
    """
    # SPM stage-2 parity (actors/mixformer_rgbt.py:18-26): the reference puts
    # the whole net in eval() and trains ONLY score_branch — corner-head /
    # fusion BN keep their stage-1 running stats (no re-estimation on the SPM
    # sample distribution, which contains negatives) and drop-path/dropout in
    # the frozen net are off. So train_score runs the forward in eval mode;
    # gradients still flow to the score params (the optimizer regime zeroes
    # everything else).
    net_train = not train_score

    def _forward(params, batch_stats, batch, ce_keep_rate, rngs):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if rgbt:
            t = jnp.concatenate([batch["template_v"], batch["template_i"]], axis=0)
            ot = jnp.concatenate([batch["online_template_v"], batch["online_template_i"]], axis=0)
            s = jnp.concatenate([batch["search_v"], batch["search_i"]], axis=0)
            args = (t, ot, s, ce_keep_rate)
        else:
            args = (batch["template"], batch["online_template"], batch["search"])
        kwargs = dict(run_score_head=train_score, gt_bboxes=batch.get("gt_xyxy"),
                      deterministic=not net_train, train=net_train)
        out, mutated = model.apply(variables, *args, mutable=["batch_stats"],
                                   rngs=rngs, **kwargs)
        # eval-mode forward mutates nothing: keep the existing running stats
        # (an empty dict here would wipe them from the TrainState)
        return out, mutated.get("batch_stats", batch_stats) or batch_stats

    def loss_fn(params, batch_stats, batch, ce_keep_rate, rngs):
        out, new_stats = _forward(params, batch_stats, batch, ce_keep_rate, rngs)
        if train_score:
            loss, metrics = score_loss(out["pred_scores"], batch["labels"], score_weight)
        else:
            loss, metrics = box_losses(out["pred_boxes"], batch["gt_xywh"],
                                       iou_weight, l1_weight)
        return loss, (metrics, new_stats)

    @functools.lru_cache(maxsize=32)
    def _jitted(ce_keep_rate):
        def step(state: TrainState, batch, rng):
            rngs = {"dropout": jax.random.fold_in(rng, state.step),
                    "droppath": jax.random.fold_in(rng, state.step + 1)}
            grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, batch, ce_keep_rate, rngs)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(params=new_params, opt_state=new_opt,
                                      batch_stats=new_stats, step=state.step + 1)
            metrics = dict(metrics, grad_norm=optax.global_norm(grads))
            return new_state, metrics

        if mesh is not None:
            rep = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            st = state_shardings if state_shardings is not None else rep
            return jax.jit(step, in_shardings=(st, data, rep),
                           out_shardings=(st, rep), donate_argnums=(0,))
        return jax.jit(step, donate_argnums=(0,))

    def train_step(state, batch, rng, ce_keep_rate: Optional[float] = None):
        return _jitted(ce_keep_rate)(state, batch, rng)

    # Expose the underlying jit per keep-rate bucket so profiling can lower
    # it for cost_analysis (FLOPs -> MFU, cf. tracking/profile_model.py).
    train_step.jitted = _jitted
    return train_step


def make_eval_step(model, rgbt: bool = True, iou_weight: float = 2.0,
                   l1_weight: float = 5.0):
    @jax.jit
    def eval_step(params, batch_stats, batch):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if rgbt:
            t = jnp.concatenate([batch["template_v"], batch["template_i"]], axis=0)
            ot = jnp.concatenate([batch["online_template_v"], batch["online_template_i"]], axis=0)
            s = jnp.concatenate([batch["search_v"], batch["search_i"]], axis=0)
            out = model.apply(variables, t, ot, s, None)
        else:
            out = model.apply(variables, batch["template"], batch["online_template"],
                              batch["search"])
        _, metrics = box_losses(out["pred_boxes"], batch["gt_xywh"], iou_weight, l1_weight)
        return metrics
    return eval_step
