"""Batched multi-sequence tracking: one device, N sequences in lockstep.

The reference parallelises offline evaluation with a process pool, one GPU
per worker (lib/test/evaluation/running.py:134-141,225-231). A TPU chip is
one giant MXU — the idiomatic equivalent is to vmap the (already scan'd)
track step over a BATCH of sequences, so every frame step runs N tracking
problems in one fused program. Per-sequence trajectories are identical to
single-sequence tracking: state never mixes across the vmapped axis, and a
per-(frame, sequence) validity mask freezes finished sequences exactly like
the tail padding of tracker.py track_chunk.

Throughput: batch-1 tracking leaves the MXU mostly idle (the flagship runs
~10% utilisation); batching sequences multiplies arithmetic intensity at
the same latency per step, the classic offline-eval win the reference
cannot express with DDP.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from multi_modal_tracking_tpu.tracking.tracker import (
    OnlineTrackerJit, RGBCachedTrackerJit, RGBTCachedTrackerJit,
    RGBTOnlineCachedTrackerJit, RGBTOnlineTrackerJit, RGBTrackerJit,
    RGBTTrackerJit, _put)


@dataclasses.dataclass
class BatchedRGBTTrackerJit:
    """Tracks `batch` RGBT sequences of one frame resolution in lockstep.

    API: initialize(frames0_v/i (N,H,W,3), boxes (N,4)) then
    track_block(frames_v/i (T,N,H,W,3), valid (T,N)) -> boxes (T,N,4).
    Per-sequence results equal RGBTTrackerJit run sequentially.
    """
    model: Any
    variables: Any
    template_factor: float = 2.0
    template_size: int = 128
    search_factor: float = 5.0
    search_size: int = 288
    update_interval: int = 200
    ce_keep_rate: Optional[float] = None
    scan_chunk: int = 16
    #: optional jax.sharding.Mesh with a "data" axis: the sequence batch is
    #: sharded over it (params replicated), scaling lockstep eval across
    #: chips with zero collectives — the ICI-era analogue of the reference's
    #: process-per-GPU eval pool (running.py:134-141). N must divide by the
    #: axis size.
    mesh: Optional[Any] = None

    #: single-sequence tracker whose _init_state/_step the lockstep loop
    #: vmaps; the cached subclass swaps in the template-k/v fast path.
    _single_cls = RGBTTrackerJit

    def _single_kwargs(self):
        return dict(
            model=self.model, variables=self.variables,
            template_factor=self.template_factor, template_size=self.template_size,
            search_factor=self.search_factor, search_size=self.search_size,
            update_interval=self.update_interval, ce_keep_rate=self.ce_keep_rate)

    def __post_init__(self):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._repl = NamedSharding(self.mesh, P())
            self.variables = jax.device_put(self.variables, self._repl)
        self._single = self._single_cls(**self._single_kwargs())
        self._init_jit = {}
        self._scan_jit = {}

    def _make_init(self, shape):
        # vmap the single-sequence init over the batch axis
        def init_fn(variables, imgs_v, imgs_i, boxes):
            return jax.vmap(self._single._init_state,
                            in_axes=(None, 0, 0, 0))(variables, imgs_v,
                                                     imgs_i, boxes)
        return jax.jit(init_fn)

    def _make_scan(self, shape, chunk: int):
        single_step = self._single._step

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr            # (N, H, W, 3) x2, (N,)

                def one(st1, f1v, f1i, ok1):
                    new_st, box = single_step(shape, variables, st1, f1v, f1i)
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, box
                return jax.vmap(one)(st, fv, fi, ok)

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes               # boxes (T, N, 4)
        return jax.jit(track_fn)

    def _put_batch(self, x, batch_axis: int, dtype=None):
        """Upload with the batch axis sharded over the mesh's data axis
        (replicated otherwise); identical to _put when mesh is None."""
        if self.mesh is None:
            return _put(x, dtype)
        from jax.sharding import NamedSharding, PartitionSpec as P
        arr = np.asarray(x, dtype) if not isinstance(x, jax.Array) else x
        spec = [None] * arr.ndim
        spec[batch_axis] = "data"
        return jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))

    # --------------------------------------------------------------- host API
    def initialize(self, frames_v: np.ndarray, frames_i: np.ndarray,
                   boxes: np.ndarray):
        """frames_*: (N, H, W, 3) uint8 frame-0 stack; boxes: (N, 4) xywh.
        For unimodal sequences pass the SAME array as both modalities — it
        is uploaded once and the mode transform decides what it feeds."""
        shape = frames_v.shape[1:3]
        if shape not in self._init_jit:
            self._init_jit[shape] = self._make_init(shape)
        dv = self._put_batch(frames_v, 0)
        di = dv if frames_i is frames_v else self._put_batch(frames_i, 0)
        self._state = self._init_jit[shape](
            self.variables, dv, di, self._put_batch(boxes, 0, np.float32))
        self._shape = shape

    def track_block(self, frames_v: np.ndarray, frames_i: np.ndarray,
                    valid: Optional[np.ndarray] = None, fetch: bool = True):
        """frames_*: (T, N, H, W, 3); valid: (T, N) bool (False freezes that
        sequence's state for the frame). Returns (T, N, 4) boxes.

        `valid` must be SUFFIX-style per sequence (True...True False...False
        — i.e. only end-of-sequence padding, as run_sequences_batched
        builds): the cached subclasses gate their template-cache rebuild on
        the scalar max(frame_id) cadence, which equals every live
        sequence's own frame_id precisely because lockstep sequences only
        ever stop at their end. An intermittent False would desynchronise
        that sequence's frame_id from the batch leader and silently change
        its update cadence vs sequential tracking."""
        T, N = frames_v.shape[:2]
        K = self.scan_chunk
        key = (self._shape, K, N)
        if key not in self._scan_jit:
            self._scan_jit[key] = self._make_scan(self._shape, K)
        fn = self._scan_jit[key]
        if valid is None:
            valid = np.ones((T, N), np.bool_)
        elif isinstance(valid, np.ndarray):
            v = valid.astype(bool)
            if np.any(v[1:] & ~v[:-1]):
                raise ValueError(
                    "track_block valid mask must be suffix-style per "
                    "sequence (no True after a False) — see docstring")
        outs = []
        st = self._state
        unimodal = frames_i is frames_v        # upload the shared stack once
        for lo in range(0, T, K):
            hi = min(lo + K, T)
            whole = lo == 0 and hi == T
            bv = frames_v if whole else frames_v[lo:hi]
            bi = bv if unimodal else (frames_i if whole else frames_i[lo:hi])
            ok = valid[lo:hi]
            n = hi - lo
            if n < K:
                pad = K - n
                xp = jnp if isinstance(frames_v, jax.Array) else np
                bv = xp.concatenate([bv, xp.repeat(bv[-1:], pad, axis=0)])
                bi = bv if unimodal else \
                    xp.concatenate([bi, xp.repeat(bi[-1:], pad, axis=0)])
                ok = np.concatenate([ok, np.zeros((pad, N), np.bool_)])
            dbv = self._put_batch(bv, 1)
            dbi = dbv if bi is bv else self._put_batch(bi, 1)
            st, bxs = fn(self.variables, st, dbv, dbi,
                         self._put_batch(ok, 1))
            # bxs is (T, N, 4) boxes, or a pytree of per-frame outputs (the
            # online trackers yield (boxes, scores))
            outs.append(jax.tree.map(lambda a: a[:n], bxs) if n < K else bxs)
        self._state = st
        stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        return jax.tree.map(np.asarray, stacked) if fetch else stacked


@dataclasses.dataclass
class BatchedRGBTCachedTrackerJit(BatchedRGBTTrackerJit):
    """Lockstep batching through the cached-template fast path.

    Per frame only the search tokens run the backbone
    (RGBTCachedTrackerJit._step_search, ~40% fewer FLOPs than the full
    forward the plain batched tracker vmaps). The interval-gated set_online
    cache rebuild is hoisted OUT of the vmap onto a scalar lax.cond: under
    vmap a per-sequence cond lowers to a select that would execute
    set_online every frame for every sequence, erasing the fast path's
    entire saving. The scalar cadence is exact, not approximate — lockstep
    sequences all advance frame_id together while valid (so the per-sequence
    `frame_id % interval` of single-sequence tracking is the same scalar for
    every live sequence), and finished sequences are excluded from the
    rebuild by the same validity mask that freezes their state."""

    _single_cls = RGBTCachedTrackerJit

    def _make_scan(self, shape, chunk: int):
        single = self._single
        interval = self.update_interval

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr            # (N, H, W, 3) x2, (N,)

                def one(st1, f1v, f1i, ok1):
                    new_st, box = single._step_search(shape, variables, st1,
                                                      f1v, f1i)
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, box
                new_st, boxes = jax.vmap(one)(st, fv, fi, ok)

                def rebuild(s):
                    def one_up(st1, f1v, f1i, ok1):
                        cache = single._rebuild_cache(variables, st1, f1v, f1i)
                        cache = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(ok1, a, b), cache, st1.cache)
                        return st1.replace(cache=cache)
                    return jax.vmap(one_up)(s, fv, fi, ok)

                # live sequences share the frame cadence: max(frame_id) IS
                # every live sequence's frame_id (frozen tails never update
                # anyway — and their where(ok) above keeps the old cache).
                do_update = (jnp.max(new_st.frame_id) % interval) == 0
                new_st = jax.lax.cond(do_update, rebuild, lambda s: s, new_st)
                return new_st, boxes

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes               # boxes (T, N, 4)
        return jax.jit(track_fn)


@dataclasses.dataclass
class BatchedRGBTOnlineTrackerJit(BatchedRGBTTrackerJit):
    """Lockstep batching for the score-gated SPM trackers
    (asymmetric_shared_online): every frame runs the score head; candidate
    selection, decay and the interval-gated template commit are the same
    elementwise where-selects as the single tracker (vmap-safe).
    track_block returns (boxes (T, N, 4), scores (T, N))."""

    max_score_decay: float = 1.0
    _single_cls = RGBTOnlineTrackerJit

    def _single_kwargs(self):
        return dict(super()._single_kwargs(),
                    max_score_decay=self.max_score_decay)

    def _make_scan(self, shape, chunk: int):
        single_step = self._single._step

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr

                def one(st1, f1v, f1i, ok1):
                    new_st, box, score = single_step(shape, variables, st1,
                                                     f1v, f1i)
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, (box, score)
                return jax.vmap(one)(st, fv, fi, ok)

            st, outs = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, outs
        return jax.jit(track_fn)


@dataclasses.dataclass
class BatchedRGBTOnlineCachedTrackerJit(BatchedRGBTOnlineTrackerJit):
    """Online lockstep through the cached-template fast path. The scalar
    update cadence is hoisted out of the vmap exactly as in
    BatchedRGBTCachedTrackerJit; the rebuild consumes the online-template
    crops the vmapped search step already committed into the state."""

    _single_cls = RGBTOnlineCachedTrackerJit

    def _make_scan(self, shape, chunk: int):
        single = self._single
        interval = self.update_interval

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr

                def one(st1, f1v, f1i, ok1):
                    new_st, box, score = single._step_search(shape, variables,
                                                             st1, f1v, f1i)
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, (box, score)
                new_st, outs = jax.vmap(one)(st, fv, fi, ok)

                def rebuild(s):
                    def one_up(st1, ok1):
                        cache = single._rebuild_cache(variables, st1)
                        cache = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(ok1, a, b), cache, st1.cache)
                        return st1.replace(cache=cache)
                    return jax.vmap(one_up)(s, ok)

                do_update = (jnp.max(new_st.frame_id) % interval) == 0
                new_st = jax.lax.cond(do_update, rebuild, lambda s: s, new_st)
                return new_st, outs

            st, outs = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, outs
        return jax.jit(track_fn)


@dataclasses.dataclass
class BatchedRGBTrackerJit(BatchedRGBTTrackerJit):
    """Unimodal lockstep tracking (RGB / TIR / Prompt input modes) — the
    batching lever for the big unimodal sweeps (LaSOT / GOT-10k /
    TrackingNet, SURVEY §2.3) where the reference spends a process-pool of
    GPUs (running.py:134-141). Pass the same frame stack as both modalities
    for RGB sequences (uploaded once); TIR/Prompt read the second stack."""

    # unimodal family defaults (RGBTrackerJit/OnlineTrackerJit use 4.5,
    # not the RGBT family's 5.0)
    search_factor: float = 4.5
    mode: str = "RGB"
    prompt_lambda: float = 0.05   # reference tracker.py:160
    _single_cls = RGBTrackerJit

    def _single_kwargs(self):
        return dict(
            model=self.model, variables=self.variables,
            template_factor=self.template_factor, template_size=self.template_size,
            search_factor=self.search_factor, search_size=self.search_size,
            update_interval=self.update_interval,
            mode=self.mode, prompt_lambda=self.prompt_lambda)

    def _make_scan(self, shape, chunk: int):
        single = self._single

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr

                def one(st1, f1v, f1i, ok1):
                    new_st, box = single._step(shape, variables, st1,
                                               single._frame(f1v, f1i))
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, box
                return jax.vmap(one)(st, fv, fi, ok)

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes
        return jax.jit(track_fn)


@dataclasses.dataclass
class BatchedRGBCachedTrackerJit(BatchedRGBTrackerJit):
    """Unimodal lockstep through the set_online/forward_test k/v cache
    (scalar-cadence rebuild hoisted out of the vmap, same argument as
    BatchedRGBTCachedTrackerJit)."""

    _single_cls = RGBCachedTrackerJit

    def _make_scan(self, shape, chunk: int):
        single = self._single
        interval = self.update_interval

        def track_fn(variables, st, frames_v, frames_i, valid):
            def body(st, fr):
                fv, fi, ok = fr

                def one(st1, f1v, f1i, ok1):
                    new_st, box = single._step_search(shape, variables, st1,
                                                      single._frame(f1v, f1i))
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, box
                new_st, boxes = jax.vmap(one)(st, fv, fi, ok)

                def rebuild(s):
                    def one_up(st1, f1v, f1i, ok1):
                        cache = single._rebuild_cache(variables, st1,
                                                      single._frame(f1v, f1i))
                        cache = jax.tree_util.tree_map(
                            lambda a, b: jnp.where(ok1, a, b), cache, st1.cache)
                        return st1.replace(cache=cache)
                    return jax.vmap(one_up)(s, fv, fi, ok)

                do_update = (jnp.max(new_st.frame_id) % interval) == 0
                new_st = jax.lax.cond(do_update, rebuild, lambda s: s, new_st)
                return new_st, boxes

            st, boxes = jax.lax.scan(body, st, (frames_v, frames_i, valid))
            return st, boxes
        return jax.jit(track_fn)


@dataclasses.dataclass
class BatchedOnlineTrackerJit(BatchedRGBTrackerJit):
    """Unimodal online lockstep (multi-template ring + score-gated
    candidacy, CvT/ViT/ConvMAE online models). The per-sequence ring commit
    (dynamic_update_slice at forget_id) vmaps to a scatter; only the
    set_online cache refresh hoists to the scalar cadence. The lockstep
    carry is the (state, cache) pair; track_block returns (boxes, scores)."""

    online_size: int = 3
    max_score_decay: float = 1.0
    _single_cls = OnlineTrackerJit

    def _single_kwargs(self):
        return dict(super()._single_kwargs(), online_size=self.online_size,
                    max_score_decay=self.max_score_decay)

    def _make_scan(self, shape, chunk: int):
        single = self._single
        interval = self.update_interval

        def track_fn(variables, carry, frames_v, frames_i, valid):
            def body(carry, fr):
                st, cache = carry
                fv, fi, ok = fr

                def one(st1, c1, f1v, f1i, ok1):
                    new_st, box, score = single._step_search(
                        shape, variables, st1, c1, single._frame(f1v, f1i))
                    new_st = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(ok1, a, b), new_st, st1)
                    return new_st, (box, score)
                new_st, outs = jax.vmap(one)(st, cache, fv, fi, ok)

                def refresh(args):
                    s, c = args

                    def one_up(st1, c1, ok1):
                        nc = single._refresh_cache(variables, st1)
                        return jax.tree_util.tree_map(
                            lambda a, b: jnp.where(ok1, a, b), nc, c1)
                    return jax.vmap(one_up)(s, c, ok)

                do_update = (jnp.max(new_st.frame_id) % interval) == 0
                cache = jax.lax.cond(do_update, refresh, lambda a: a[1],
                                     (new_st, cache))
                return (new_st, cache), outs

            carry, outs = jax.lax.scan(body, carry, (frames_v, frames_i, valid))
            return carry, outs
        return jax.jit(track_fn)


def run_sequences_batched(sequences: List, tracker: BatchedRGBTTrackerJit,
                          results_dir: str, chunk: Optional[int] = None,
                          skip_if_done: bool = True) -> List[dict]:
    """Evaluate a same-resolution group of RGBT sequences in lockstep and
    write the standard per-sequence result files (eval/running.py layout).

    Sequences are padded to the longest length; finished sequences are
    frozen by the validity mask, and their padded frames replay the last
    real frame (uploaded once — the frames tensor is built per time block).
    """
    import os
    import time as _time

    from multi_modal_tracking_tpu.eval.running import _load_frame

    os.makedirs(results_dir, exist_ok=True)
    todo = [s for s in sequences
            if not (skip_if_done and
                    os.path.isfile(os.path.join(results_dir, f"{s.name}.txt")))]
    if not todo:
        return []
    N = len(todo)
    lengths = [len(s.frames) for s in todo]
    T = max(lengths)

    f0 = [_load_frame(s, 0) for s in todo]
    rgbt = isinstance(f0[0], list)        # unimodal _load_frame -> bare array
    frames0_v = np.stack([(f[0] if rgbt else f) for f in f0])
    frames0_i = np.stack([f[1] for f in f0]) if rgbt else frames0_v
    from multi_modal_tracking_tpu.tracking.tracker import _select_init_box
    mode = getattr(tracker, "mode", "RGB")
    boxes0 = np.stack([
        np.asarray(_select_init_box(s.init_info()["init_bbox"], mode),
                   np.float32).reshape(-1)[-4:]
        for s in todo])
    t_start = _time.time()
    tracker.initialize(frames0_v, frames0_i, boxes0)

    K = chunk or tracker.scan_chunk
    all_boxes = np.zeros((T - 1, N, 4), np.float64)
    all_scores = None
    pending = []
    for lo in range(1, T, K):
        hi = min(lo + K, T)
        blk_v = np.empty((hi - lo, N, *frames0_v.shape[1:]), frames0_v.dtype)
        blk_i = np.empty_like(blk_v) if rgbt else blk_v   # shared: 1 upload
        ok = np.zeros((hi - lo, N), np.bool_)
        for j, s in enumerate(todo):
            last = None           # finished sequences pad with their final
            for t in range(lo, hi):   # frame: decode it ONCE per block, not
                k = min(t, lengths[j] - 1)     # once per padded timestep
                if t >= lengths[j] and last is not None:
                    fr = last
                else:
                    fr = _load_frame(s, k)
                last = fr
                blk_v[t - lo, j] = fr[0] if rgbt else fr
                if rgbt:
                    blk_i[t - lo, j] = fr[1]
                ok[t - lo, j] = t < lengths[j]
        pending.append((lo, hi, tracker.track_block(blk_v, blk_i, ok, fetch=False)))
    for lo, hi, bxs in pending:
        if isinstance(bxs, tuple):               # online trackers: (boxes, scores)
            bxs, scs = bxs
            if all_scores is None:
                # frame 0 defaults to 1.0 (running.py's score init)
                all_scores = np.ones((T - 1, N), np.float64)
            all_scores[lo - 1: hi - 1] = np.asarray(scs)
        all_boxes[lo - 1: hi - 1] = np.asarray(bxs)
    elapsed = _time.time() - t_start

    stats = []
    total_frames = sum(lengths)
    for j, s in enumerate(todo):
        n = lengths[j]
        out = np.zeros((n, 4), np.float64)
        out[0] = boxes0[j]
        out[1:] = all_boxes[: n - 1, j]
        np.savetxt(os.path.join(results_dir, f"{s.name}.txt"), out,
                   delimiter="\t", fmt="%d")
        if all_scores is not None:
            scores = np.ones((n,), np.float64)
            scores[1:] = all_scores[: n - 1, j]
            np.savetxt(os.path.join(results_dir, f"{s.name}_score.txt"),
                       scores, delimiter="\t", fmt="%.2f")
        per = elapsed * (n / total_frames)
        np.savetxt(os.path.join(results_dir, f"{s.name}_time.txt"),
                   np.full((n,), per / n), fmt="%f")
        stats.append({"seq": s.name, "n_frames": n, "fps": n / max(per, 1e-9)})
    print(f"batched eval: {N} sequences x {T} frames in {elapsed:.1f}s "
          f"({total_frames / max(elapsed, 1e-9):.1f} aggregate FPS)")
    return stats
