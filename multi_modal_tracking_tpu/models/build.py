"""Model registry: script name -> builder.

Parity target: the 12-way dispatch in lib/train/train_script_mixformer.py:77-102.
Each builder returns an un-initialised flax Module; parameters come from
`model.init` or a converted reference checkpoint
(multi_modal_tracking_tpu/utils/checkpoint.py).
"""
from __future__ import annotations

import jax.numpy as jnp

from multi_modal_tracking_tpu.models.asymmetric_shared import build_mixformer_rgbt
from multi_modal_tracking_tpu.models.mixformer import build_mixformer_vit


def build_model(script: str, cfg, dtype=jnp.float32, axis_name=None):
    """Build the model module for a training/eval script name."""
    rgbt_shared = {
        "asymmetric_shared": dict(with_score=False),
        "asymmetric_shared_ce": dict(with_score=False),
        "asymmetric_shared_online": dict(with_score=True),
    }
    if script in rgbt_shared:
        return build_mixformer_rgbt(cfg, dtype=dtype, axis_name=axis_name,
                                    **rgbt_shared[script])
    if script == "mixformer_vit":
        return build_mixformer_vit(cfg, with_score=False, dtype=dtype, axis_name=axis_name)
    if script == "mixformer_vit_online":
        return build_mixformer_vit(cfg, with_score=True, dtype=dtype, axis_name=axis_name)
    if script in ("mixformer_cvt", "mixformer_cvt_online"):
        from multi_modal_tracking_tpu.models.cvt import build_mixformer_cvt
        return build_mixformer_cvt(cfg, with_score=script.endswith("online"), dtype=dtype,
                                   axis_name=axis_name)
    if script in ("mixformer_convmae", "mixformer_convmae_online"):
        from multi_modal_tracking_tpu.models.convmae import build_mixformer_convmae
        return build_mixformer_convmae(cfg, with_score=script.endswith("online"), dtype=dtype,
                                       axis_name=axis_name)
    vit_rgbt = {
        "mixformer_vit_rgbt": ("two_stream", False),
        "mixformer_vit_rgbt_online": ("two_stream", True),
        "mixformer_vit_rgbt_shared": ("shared", False),
        "mixformer_vit_rgbt_unibackbone": ("unibackbone", False),
    }
    if script in vit_rgbt:
        from multi_modal_tracking_tpu.models.vit_rgbt import build_vit_rgbt
        variant, with_score = vit_rgbt[script]
        return build_vit_rgbt(cfg, variant=variant, with_score=with_score,
                              dtype=dtype, axis_name=axis_name)
    raise KeyError(f"unknown script {script}")
