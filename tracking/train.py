"""Training CLI.

Parity target: tracking/train.py of the reference (:32-55) + the
run_training / train_script dispatch (lib/train/run_training.py,
train_script_mixformer.py). No torchrun/NCCL bootstrap is needed: one
process drives every local TPU chip through a GSPMD data mesh
(SURVEY.md §2.6); multi-host would add jax.distributed.initialize().

Usage:
  python tracking/train.py --script asymmetric_shared_ce --config baseline \
      --save_dir ./output
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description="Train a tracker.")
    p.add_argument("--script", type=str, required=True,
                   help="model script name (e.g. asymmetric_shared_ce)")
    p.add_argument("--config", type=str, default=None,
                   help="experiment yaml under experiments/<script>/")
    p.add_argument("--save_dir", type=str, default="./output")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--epochs", type=int, default=None, help="override TRAIN.EPOCH")
    p.add_argument("--batch", type=int, default=None, help="override TRAIN.BATCH_SIZE")
    p.add_argument("--resume", action="store_true", help="resume from latest ckpt")
    p.add_argument("--no_mesh", action="store_true", help="single-device (debug)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the data axis "
                        "(sets TRAIN.FSDP; see parallel/mesh.py fsdp_shardings)")
    p.add_argument("--remat", action="store_true",
                   help="gradient-checkpoint the backbone blocks "
                        "(sets TRAIN.REMAT; ~1/depth activation HBM)")
    p.add_argument("--no_fail_safe", action="store_true")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host: coordinator address host:port "
                        "(or set JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    args = p.parse_args()

    # Multi-host bootstrap (the torchrun/NCCL dist_init analogue,
    # run_training_ddp.py:91-99): must happen before any jax device use.
    from multi_modal_tracking_tpu.parallel.distributed import initialize_distributed
    if initialize_distributed(args.coordinator, args.num_processes, args.process_id):
        import jax
        print(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
              f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    from multi_modal_tracking_tpu.config import get_default_config
    from multi_modal_tracking_tpu.train.trainer import Trainer

    cfg = get_default_config(args.script)
    if args.config:
        exp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "experiments", args.script, f"{args.config}.yaml")
        cfg.update_from_file(exp)
    if args.epochs:
        cfg.TRAIN.EPOCH = args.epochs
    if args.batch:
        cfg.TRAIN.BATCH_SIZE = args.batch
    if args.fsdp:
        cfg.TRAIN.FSDP = True
    if args.remat:
        cfg.TRAIN.REMAT = True

    # Log the effective config + trainable params (train_script_mixformer.py:147-154)
    os.makedirs(args.save_dir, exist_ok=True)
    cfg.dump(os.path.join(args.save_dir, f"{args.script}_{args.config or 'default'}.yaml"))

    trainer = Trainer(args.script, cfg, save_dir=args.save_dir,
                      use_mesh=not args.no_mesh, seed=args.seed)
    print(f"model: {trainer.net_name}, {trainer._n_trainable} trainable param tensors, "
          f"{trainer.steps_per_epoch} steps/epoch")
    trainer.train(load_latest=args.resume, fail_safe=not args.no_fail_safe)


if __name__ == "__main__":
    main()
