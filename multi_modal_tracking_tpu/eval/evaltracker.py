"""Tracker construction for evaluation: script name + params -> jitted tracker.

Parity target: lib/test/evaluation/tracker_rgbt.py RGBT_Tracker (:53-200,
loads the per-model tracker class and parameters) and tracker.py Tracker
(:56+ with mode RGB/TIR/Prompt) — collapsed into one factory because every
per-model tracker file in the reference repeats the same init/track pattern
(lib/test/tracker/*.py); here that pattern IS the jitted loop in
multi_modal_tracking_tpu/tracking/tracker.py and only the model differs.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.eval.params import TrackerParams, update_interval_for
from multi_modal_tracking_tpu.models.build import build_model

_RGBT_SCRIPTS = {
    "asymmetric_shared", "asymmetric_shared_ce", "asymmetric_shared_online",
    "mixformer_vit_rgbt", "mixformer_vit_rgbt_shared", "mixformer_vit_rgbt_unibackbone",
}


def is_rgbt_script(script: str) -> bool:
    return script in _RGBT_SCRIPTS


def create_tracker(params: TrackerParams, dataset_name: str = "",
                   mode: str = "RGBT", variables=None, dtype=jnp.bfloat16):
    """Build model + variables and wrap in the right jitted tracking loop.

    mode: 'RGBT' for bimodal scripts; 'RGB' | 'TIR' | 'Prompt' for unimodal
    (lib/test/evaluation/tracker.py:56-57).
    """
    from multi_modal_tracking_tpu.utils.cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    from multi_modal_tracking_tpu.tracking.tracker import (OnlineTrackerJit,
                                                            RGBTCachedTrackerJit,
                                                            RGBTOnlineCachedTrackerJit,
                                                            RGBTrackerJit)

    cfg = params.cfg
    script = params.script
    model = build_model(script, cfg, dtype=dtype)

    if variables is None:
        ts, ss = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
        lead = 2 if is_rgbt_script(script) else 1
        t = jnp.zeros((lead, ts, ts, 3), jnp.float32)
        s = jnp.zeros((lead, ss, ss, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), t, t, s)
        if params.checkpoint:
            from multi_modal_tracking_tpu.utils.checkpoint import load_variables
            variables = load_variables(params.checkpoint, variables)
        # no checkpoint -> the tracker runs randomly-initialised weights
        # (fixture/smoke use); real evals always resolve params.checkpoint

    if dtype == jnp.bfloat16:
        # params get cast to the compute dtype at every use; pre-casting is
        # numerically identical and halves weight HBM traffic per frame
        from multi_modal_tracking_tpu.utils.checkpoint import cast_floating
        variables = cast_floating(variables, jnp.bfloat16)

    update_interval = update_interval_for(cfg, dataset_name)
    common = dict(model=model, variables=variables,
                  template_factor=params.template_factor,
                  template_size=params.template_size,
                  search_factor=params.search_factor,
                  search_size=params.search_size,
                  update_interval=update_interval)
    online = script.endswith("_online")
    if is_rgbt_script(script):
        from multi_modal_tracking_tpu.tracking.tracker import (
            RGBTOnlineTrackerJit, RGBTTrackerJit)
        # ce_keep_rate=None at test time: the reference tracker calls the
        # network without a keep rate (tracker/asymmetric_shared_ce.py:90-98),
        # so each CE block uses its OWN configured keep_ratio_search — a
        # runtime rate would override every block with one value, wrong for
        # per-block CE_KEEP_RATIO configs (identical for the shipped uniform
        # [0.7, 0.7, 0.7]).
        ce_rate = None
        # cached-template fast path (bit-identical trajectories at ~40%
        # fewer backbone FLOPs/frame, tests/test_tracker.py equality) — only
        # for models that implement set_online/forward_track (the
        # asymmetric_shared family); the plain vit_rgbt variants run the
        # full-forward loops.
        cached = hasattr(type(model), "set_online") and \
            hasattr(type(model), "forward_track")
        if online:
            cls = RGBTOnlineCachedTrackerJit if cached else RGBTOnlineTrackerJit
            return cls(ce_keep_rate=ce_rate,
                       max_score_decay=online_size_decay(cfg)[1], **common)
        cls = RGBTCachedTrackerJit if cached else RGBTTrackerJit
        return cls(ce_keep_rate=ce_rate, **common)
    if mode == "RGBT":
        # the bimodal default reaching a unimodal script means the caller
        # didn't pick a modality: run the natural RGB path (the unimodal
        # classes raise on anything outside RGB | TIR | Prompt, so a stray
        # 'RGBT' can no longer silently fall through to the Prompt blend)
        mode = "RGB"
    if online:
        size, decay = online_size_decay(cfg, dataset_name)
        return OnlineTrackerJit(mode=mode, online_size=size,
                                max_score_decay=decay, **common)
    from multi_modal_tracking_tpu.tracking.tracker import RGBCachedTrackerJit
    if hasattr(type(model), "set_online") and hasattr(type(model), "forward_test"):
        # cached-k/v fast path, exact by the same asymmetry as forward_test
        # (cache-losslessness tests in tests/test_models.py / test_cvt.py)
        return RGBCachedTrackerJit(mode=mode, **common)
    return RGBTrackerJit(mode=mode, **common)


def online_size_decay(cfg, dataset_name: str = "") -> tuple:
    """Per-dataset online template memory size + max-score decay.

    Listed datasets take TEST.ONLINE_SIZES[NAME][0]; unlisted fall back to 3
    exactly like the reference trackers (mixformer_cvt_online.py:40-44,
    mixformer_vit_online.py:39-45 — every shipped config value is 3 too).
    max_score_decay defaults to 1.0."""
    size = 3
    sizes = cfg.TEST.get("ONLINE_SIZES", None)
    if sizes is not None:
        v = sizes.get(dataset_name.upper()) if hasattr(sizes, "get") else None
        if v is not None:
            size = v[0] if isinstance(v, (list, tuple)) else int(v)
    decay = float(cfg.TEST.get("MAX_SCORE_DECAY", 1.0))
    return size, decay
