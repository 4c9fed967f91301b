"""Epoch-loop trainer with fail-safe restart and checkpoint/resume.

Parity targets:
  lib/train/trainers/base_trainer.py — train() epoch loop with fail_safe
  (catch exception -> reload latest ckpt -> continue, :64-108), atomic
  rank-0 checkpointing (:115-148), load_checkpoint/resume (:150-228),
  stage-1 -> stage-2 warm start (:230-272).
  lib/train/trainers/rgbt_trainer.py — cycle_dataset (:61-115): per-batch
  forward/backward, grad accumulation + clipping, stats + FPS print every
  print_interval, per-epoch TensorBoard; validation cycle every
  VAL_EPOCH_INTERVAL (:117-130).
  lib/train/train_script_mixformer.py — model dispatch, optimizer regimes,
  actor/loss selection (:45-172).

TPU-first: DDP/AMP/loss-scaler collapse into ONE jitted GSPMD train step
(train_step.py) over a data mesh; the CE keep-rate cosine schedule is
bucketised host-side so recompiles stay bounded; checkpoints carry the full
TrainState (params + optimizer) so resume is exact.
"""
from __future__ import annotations

import os
import time
import traceback
from typing import Optional

import jax
import numpy as np

from multi_modal_tracking_tpu.models.build import build_model
from multi_modal_tracking_tpu.parallel.distributed import (process_seed,
                                                           shard_host_batch)
from multi_modal_tracking_tpu.parallel.mesh import create_mesh, replicate
from multi_modal_tracking_tpu.train.builders import build_dataloaders, is_rgbt_config
from multi_modal_tracking_tpu.train.data.loader import batch_to_model_inputs
from multi_modal_tracking_tpu.train.optimizer import make_optimizer, trainable_mask
from multi_modal_tracking_tpu.train.stats import StatsTracker
from multi_modal_tracking_tpu.train.train_step import (TrainState,
                                                       adjust_keep_rate,
                                                       bucketize_keep_rate,
                                                       make_eval_step,
                                                       make_train_step)
from multi_modal_tracking_tpu.utils import checkpoint as ckpt


class Trainer:
    def __init__(self, script: str, cfg, save_dir: str = "output",
                 use_mesh: bool = True, seed: int = 42, log_dir: Optional[str] = None,
                 print_interval: Optional[int] = None):
        from multi_modal_tracking_tpu.utils.cache import \
            enable_persistent_compile_cache
        enable_persistent_compile_cache()
        import jax.numpy as jnp

        self.script = script
        self.cfg = cfg
        self.rgbt = is_rgbt_config(cfg)
        self.save_dir = save_dir
        self.ckpt_dir = os.path.join(save_dir, "checkpoints", script)
        self.epoch = 0

        # Per-host sampler seed (run_training_ddp.py:18-24 base_seed + rank):
        # under multi-host each process draws a disjoint sample stream and
        # feeds its local shard of the global batch (shard_host_batch).
        self.train_loader, self.val_loader = build_dataloaders(
            cfg, seed=process_seed(seed))
        self.steps_per_epoch = max(
            1, cfg.DATA.TRAIN.SAMPLE_PER_EPOCH // cfg.TRAIN.BATCH_SIZE)

        self.model = build_model(script, cfg, dtype=jnp.bfloat16)
        self.net_name = type(self.model).__name__

        ts, ss = cfg.DATA.TEMPLATE.SIZE, cfg.DATA.SEARCH.SIZE
        lead = 2 if self.rgbt else 1
        t = jnp.zeros((lead, ts, ts, 3), jnp.float32)
        s = jnp.zeros((lead, ss, ss, 3), jnp.float32)
        # Score-bearing (SPM/online) models must init THROUGH the score head
        # so its params exist — flax creates params lazily at init, and the
        # stage-2 regime (freeze all but "score", base_functions.py:301-310)
        # would otherwise see zero trainable tensors and the train step would
        # hit a missing-scope error on the first forward.
        with_score = bool(getattr(self.model, "with_score", False))
        init_fn = ((lambda r, a, b, c: self.model.init(
            r, a, b, c, run_score_head=True)) if with_score
            else self.model.init)
        variables = jax.jit(init_fn)(jax.random.PRNGKey(seed), t, t, s)

        # Warm starts (asymmetric_shared_ce.py:643-674 / base_trainer.py:230-272)
        # MAE backbone init first (asymmetric_shared_ce.py:515-533), then the
        # tracker-level checkpoints overwrite whatever they cover.
        # A configured-but-missing path fails loudly (the reference's
        # torch.load raises there too): silently training 150 epochs from
        # random init is the worst possible failure mode.
        bb = cfg.MODEL.get("BACKBONE", {})
        mae_path = bb.get("PRETRAINED_PATH", "") if bb.get("PRETRAINED") else ""
        if mae_path:
            if not os.path.isfile(mae_path):
                raise FileNotFoundError(
                    f"MODEL.BACKBONE.PRETRAINED_PATH = {mae_path!r} not found "
                    f"(cwd {os.getcwd()!r}); set MODEL.BACKBONE.PRETRAINED "
                    f"False to train from random init")
            variables = ckpt.load_variables(mae_path, variables,
                                            strict=False)
            print(f"warm start backbone from MAE pretrain {mae_path}")
        for key in ("TRACKER_PRETRAINED_PATH", "SCORE_PRETRAINED_PATH",
                    "RGBT_PRETRAINED_PATH"):
            path = cfg.MODEL.get(key, "")
            if path:
                if not os.path.isfile(path):
                    raise FileNotFoundError(
                        f"MODEL.{key} = {path!r} not found (cwd "
                        f"{os.getcwd()!r}); clear the key to skip the warm start")
                variables = ckpt.load_variables(path, variables,
                                                strict=False)
                print(f"warm start from {key} = {path}")

        self.tx = make_optimizer(cfg, variables["params"],
                                 steps_per_epoch=self.steps_per_epoch)
        state = TrainState.create(variables, self.tx)
        self.mesh = create_mesh() if use_mesh else None
        state_shardings = None
        if self.mesh is not None and cfg.TRAIN.get("FSDP", False):
            # ZeRO/FSDP: params + Adam moments sharded over the data axis
            # (parallel/mesh.py fsdp_shardings) — per-device state memory
            # drops ~n_devices x, numerics identical (tests/test_fsdp.py)
            from multi_modal_tracking_tpu.parallel.mesh import fsdp_shardings
            state_shardings = fsdp_shardings(state, self.mesh)
            self.state = jax.device_put(state, state_shardings)
        else:
            self.state = (replicate(state, self.mesh)
                          if self.mesh is not None else state)
        self._state_shardings = state_shardings

        self.train_score = cfg.TRAIN.get("TRAIN_SCORE", False)
        self._step = make_train_step(
            self.model, self.tx, mesh=self.mesh, rgbt=self.rgbt,
            iou_weight=cfg.TRAIN.IOU_WEIGHT, l1_weight=cfg.TRAIN.L1_WEIGHT,
            train_score=self.train_score,
            score_weight=cfg.TRAIN.get("SCORE_WEIGHT", 1.0),
            state_shardings=state_shardings)
        self._eval_step = make_eval_step(self.model, rgbt=self.rgbt,
                                         iou_weight=cfg.TRAIN.IOU_WEIGHT,
                                         l1_weight=cfg.TRAIN.L1_WEIGHT)
        self.rng = jax.random.PRNGKey(seed + 1)

        self.stats = StatsTracker(log_dir or os.path.join(save_dir, "logs", script),
                                  print_interval or cfg.TRAIN.PRINT_INTERVAL)
        self._n_trainable = int(np.sum(jax.tree.leaves(
            jax.tree.map(lambda m: int(m), trainable_mask(cfg, variables["params"])))))

    # ------------------------------------------------------------ ckpt/resume
    def save_checkpoint(self):
        if self._state_shardings is not None:
            # FSDP: shards may live on other hosts, so a rank-0
            # jax.device_get would fail (non-fully-addressable arrays) or
            # OOM one host's RAM. Orbax writes shard-parallel — EVERY
            # process participates (utils/checkpoint.py
            # save_checkpoint_sharded); the epoch rides the dir name.
            return ckpt.save_checkpoint_sharded(self.ckpt_dir, self.net_name,
                                                self.epoch, self.state)
        if jax.process_index() != 0:      # rank-0 only (base_trainer.py:97)
            return None
        return ckpt.save_checkpoint(self.ckpt_dir, self.net_name, self.epoch,
                                    {"state": jax.device_get(self.state),
                                     "epoch": self.epoch})

    def load_checkpoint(self, path: Optional[str] = None) -> bool:
        if self._state_shardings is not None:
            path = path or ckpt.latest_checkpoint_sharded(self.ckpt_dir,
                                                          self.net_name)
            if not path or not os.path.isdir(path):
                return False
            # Restore straight INTO the FSDP shardings (each process reads
            # only its shards; live state supplies structure/dtypes).
            self.state = ckpt.load_checkpoint_sharded(
                path, self.state, shardings=self._state_shardings)
            self.epoch = ckpt.checkpoint_epoch(path)
            print(f"resumed from {path} (epoch {self.epoch})")
            return True
        path = path or ckpt.latest_checkpoint(self.ckpt_dir, self.net_name)
        if not path or not os.path.isfile(path):
            return False
        target = {"state": jax.device_get(self.state), "epoch": 0}
        restored = ckpt.load_checkpoint(path, target)
        if self.mesh is not None:
            self.state = replicate(restored["state"], self.mesh)
        else:
            self.state = restored["state"]
        self.epoch = int(restored["epoch"])
        print(f"resumed from {path} (epoch {self.epoch})")
        return True

    # ------------------------------------------------------------- keep rate
    def _keep_rate(self, epoch: int) -> Optional[float]:
        """Reference schedule (actors/mixformer_rgbt.py:72-80): keep 1.0 for
        the first CE_START_EPOCH epochs, then cosine-anneal to
        CE_KEEP_RATIO[0] over the next CE_WARM_EPOCH epochs."""
        cfg = self.cfg
        bb = cfg.MODEL.BACKBONE
        if not bb.get("CE_LOC", None):
            return None
        base = bb.CE_KEEP_RATIO[0] if bb.get("CE_KEEP_RATIO", None) else 1.0
        start = cfg.TRAIN.get("CE_START_EPOCH", 20)
        warm = cfg.TRAIN.get("CE_WARM_EPOCH", 80)
        rate = adjust_keep_rate(epoch, start, start + warm,
                                self.steps_per_epoch, base_keep_rate=base)
        n_search = (cfg.DATA.SEARCH.SIZE // 16) ** 2
        return bucketize_keep_rate(rate, n_search)

    # ------------------------------------------------------------- epoch loop
    def _prepared_batches(self, loader):
        """Host-side batch prep (model-input conversion + sharded device_put)
        run one step AHEAD in a background thread, so the upload of batch
        k+1 overlaps the device step on batch k."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()   # consumer abandoned the epoch (e.g. the
        # deferred NaN abort raising out of cycle_dataset): without it the
        # producer would block in q.put forever, leaking the thread and the
        # prepared (device_put) batches it holds on every fail-safe restart.
        local_devs = (max(1, len(self.mesh.devices.flat) // jax.process_count())
                      if self.mesh is not None else 1)

        def put_guarded(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for batch in loader:
                    inputs = batch_to_model_inputs(batch, rgbt=self.rgbt)
                    bsz = inputs["gt_xywh"].shape[0]
                    if self.mesh is not None:
                        if bsz % local_devs != 0:
                            # the Loader yields FIXED-size batches, so an
                            # indivisible size means every batch would be
                            # dropped and the epoch would silently no-op —
                            # fail loudly instead
                            raise ValueError(
                                f"local batch size {bsz} not divisible by "
                                f"the {local_devs} local devices — pick "
                                f"TRAIN.BATCH_SIZE a multiple of "
                                f"devices x hosts")
                        inputs = shard_host_batch(inputs, self.mesh)
                    if not put_guarded((inputs, bsz)):
                        return
            except BaseException as e:          # surface loader errors
                put_guarded(e)
                return
            put_guarded(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            try:                    # unblock + free any queued batches
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=5.0)

    def cycle_dataset(self, loader, train: bool):
        self.stats.new_epoch()
        keep_rate = self._keep_rate(self.epoch) if train else self._keep_rate(10 ** 9)
        n = len(loader)
        # Metrics are fetched in DEFERRED groups at print boundaries: jax
        # dispatch is async, so not forcing a D2H sync per step lets upload,
        # host prep and the device step pipeline. The NaN abort still fires
        # (at most print_interval steps later than the reference's
        # per-iteration check, actors/mixformer_rgbt.py:131 — same fail-safe
        # outcome: the epoch restarts from the last checkpoint).
        pending = []

        def drain(upto_i):
            for j, (m, b) in enumerate(pending, start=upto_i - len(pending) + 1):
                m = jax.device_get(m)
                if not np.isfinite(float(m["Loss/total"])):
                    raise FloatingPointError(
                        f"non-finite loss at epoch {self.epoch} it {j}")
                self.stats.update(m, b)
            pending.clear()

        i = 0
        for inputs, bsz in self._prepared_batches(loader):
            i += 1
            if train:
                self.rng, sub = jax.random.split(self.rng)
                self.state, metrics = self._step(self.state, inputs, sub,
                                                 ce_keep_rate=keep_rate)
            else:
                metrics = self._eval_step(self.state.params, self.state.batch_stats,
                                          inputs)
            pending.append((metrics, bsz))
            if i % self.stats.print_interval == 0 or i == n:
                drain(i)
                print(self.stats.line(loader.name, self.epoch, i, n))
        drain(i)
        return self.stats.log_epoch(loader.name, self.epoch)

    def train_epoch(self):
        rec = self.cycle_dataset(self.train_loader, train=True)
        if (self.val_loader is not None
                and self.epoch % self.cfg.TRAIN.VAL_EPOCH_INTERVAL == 0):
            self.cycle_dataset(self.val_loader, train=False)
        return rec

    def train(self, max_epochs: Optional[int] = None, fail_safe: bool = True,
              load_latest: bool = False, max_failures: int = 5):
        """Fail-safe epoch loop (base_trainer.py:64-108)."""
        max_epochs = max_epochs or self.cfg.TRAIN.EPOCH
        if load_latest:
            self.load_checkpoint()
        num_tries = max_failures if fail_safe else 1
        for attempt in range(num_tries):
            try:
                while self.epoch < max_epochs:
                    self.epoch += 1
                    t0 = time.time()
                    self.train_epoch()
                    self.save_checkpoint()
                    print(f"epoch {self.epoch}/{max_epochs} done "
                          f"in {time.time() - t0:.1f}s")
                return self.state
            except Exception:
                self.epoch -= 1
                if not fail_safe or attempt == num_tries - 1:
                    raise
                print("Training crashed at epoch", self.epoch + 1)
                traceback.print_exc()
                print("Restarting from last checkpoint ...")
                self.load_checkpoint()
        return self.state
