"""Train-step FLOP-reduction experiment (VERDICT r3 next-round #7).

Composition first (traced with utils/flops.py on 2026-08-20, flagship
shipped recipe, B=16, CE keep 0.7):

    forward            2.321 TFLOP   (keep=1.0 forward: 3.004 — CE is
                                      already a 23% cut)
    fwd+bwd            6.920 TFLOP   (2.98x fwd — the no-remat minimum)
    per fusion layer   0.064 TFLOP   (2.7% of fwd each, 2 layers)
    CORNER_UP vs CORNER 0.072 TFLOP  (3.1% of fwd)
    => ViT backbone ~90% of forward FLOPs.

At fixed training semantics the backbone matmuls are architecture-determined,
so the only measurable lever left is precision of the non-matmul paths.  This
script measures the judge-suggested variant: dropping the f32 softmax
accumulation in the attention (models/vit.py _attend upcasts logits to f32
for softmax, then casts back — the matmuls on either side are already bf16).

Variants:
  gbase   benched baseline (f32-softmax attention)
  gsm16   softmax computed in bf16 end-to-end (monkeypatched _attend)

NOTE (CLAUDE.md): train programs wedge this backend for later large tracking
launches — run in its own process, after any tracking measurements.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python -u artifacts/profile_train3.py
"""
import json
import time

import numpy as np

REPS = 8
TRAIN_B = 16


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from multi_modal_tracking_tpu.eval.params import get_parameters
    from multi_modal_tracking_tpu.models import vit as vit_mod
    from multi_modal_tracking_tpu.models import asymmetric_shared as asym_mod
    from multi_modal_tracking_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from multi_modal_tracking_tpu.train.optimizer import make_optimizer
    from multi_modal_tracking_tpu.train.train_step import TrainState, make_train_step
    from multi_modal_tracking_tpu.utils.flops import matmul_conv_flops

    cfg = get_parameters("asymmetric_shared_ce",
                         "attention_lasher_newfusion_2layer").cfg
    rng = np.random.default_rng(0)
    T_, S_ = 128, 288
    batch = {
        "template_v": rng.standard_normal((TRAIN_B, T_, T_, 3), np.float32),
        "template_i": rng.standard_normal((TRAIN_B, T_, T_, 3), np.float32),
        "online_template_v": rng.standard_normal((TRAIN_B, T_, T_, 3), np.float32),
        "online_template_i": rng.standard_normal((TRAIN_B, T_, T_, 3), np.float32),
        "search_v": rng.standard_normal((TRAIN_B, S_, S_, 3), np.float32),
        "search_i": rng.standard_normal((TRAIN_B, S_, S_, 3), np.float32),
        "gt_xywh": rng.uniform(0.2, 0.4, (TRAIN_B, 4)).astype(np.float32),
    }

    _attend_f32 = vit_mod._attend

    def _attend_bf16(q, k, v, scale, key_mask=None):
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if key_mask is not None:
            m = key_mask if key_mask.ndim == 2 else key_mask[None]
            attn = jnp.where(m[:, None, None, :] > 0, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1)        # bf16 throughout
        return jnp.einsum("bhqk,bhkd->bhqd", attn, v)

    results = {}
    for tag, attend in (("gbase", _attend_f32), ("gsm16", _attend_bf16)):
        vit_mod._attend = attend
        asym_mod._attend = attend
        from multi_modal_tracking_tpu.models.asymmetric_shared import \
            build_mixformer_rgbt
        model = build_mixformer_rgbt(cfg, dtype=jnp.bfloat16)
        t = jnp.zeros((2, T_, T_, 3), jnp.float32)
        s = jnp.zeros((2, S_, S_, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
        mesh = create_mesh(1)
        tx = make_optimizer(cfg, variables["params"], steps_per_epoch=1000)
        state = replicate(TrainState.create(variables, tx), mesh)
        sbatch = shard_batch(dict(batch), mesh)
        step = make_train_step(model, tx, mesh=mesh, rgbt=True,
                               iou_weight=cfg.TRAIN.IOU_WEIGHT,
                               l1_weight=cfg.TRAIN.L1_WEIGHT)
        flops = matmul_conv_flops(
            lambda st, b, k_: step(st, b, k_, ce_keep_rate=0.7),
            state, sbatch, jax.random.PRNGKey(1))

        state, m = step(state, sbatch, jax.random.PRNGKey(1), ce_keep_rate=0.7)
        np.asarray(m["Loss/total"])
        t0 = time.perf_counter()
        for k_ in range(REPS):
            state, m = step(state, sbatch, jax.random.PRNGKey(2 + k_),
                            ce_keep_rate=0.7)
        loss = float(np.asarray(m["Loss/total"]))
        dt = (time.perf_counter() - t0) / REPS
        results[tag] = {
            "ms_per_step": round(dt * 1e3, 2),
            "tflop_analytic": round(flops / 1e12, 3),
            "tflops_per_s": round(flops / dt / 1e12, 2),
            "loss_after_warm+8": round(loss, 4),
        }
        print(tag, results[tag], flush=True)

    vit_mod._attend = _attend_f32
    asym_mod._attend = _attend_f32
    results["composition_fwd_tflop"] = {
        "forward": 2.321, "fwd_bwd": 6.920, "forward_no_ce": 3.004,
        "per_fusion_layer": 0.064, "corner_up_extra": 0.072,
        "note": "traced via utils/flops.py; ViT backbone ~90% of forward",
    }
    results["conclusion"] = (
        "no fixed-semantics FLOP reduction found: the backbone dominates and "
        "CE already removes 23% of forward FLOPs; the bf16-softmax variant "
        "changes ms/step by the measured delta above (softmax is elementwise "
        "and XLA-fused, matmuls were already bf16)")
    with open("artifacts/profile_train3_r4.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
