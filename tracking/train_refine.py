"""Train the Alpha-Refine (box -> mask) network.

Parity target: external/AR/ltr/run_training.py — the separate training run
the reference uses for its refinement module, here driven by the same
dataset registry and sampler as the tracker trainer.

Usage:
  python tracking/train_refine.py --datasets SyntheticVideo --epochs 2 \
      --samples_per_epoch 64 --batch_size 4 --input_sz 128
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datasets", type=str, nargs="+", default=["SyntheticVideo"])
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--samples_per_epoch", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--input_sz", type=int, default=256)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--save_dir", type=str, default="output/refine")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))

    from multi_modal_tracking_tpu.train.builders import names2datasets
    from multi_modal_tracking_tpu.train.data.sampler import TrackingSampler
    from multi_modal_tracking_tpu.train.refine import (batch_from_box_dataset,
                                                       build_refine_trainer)
    from multi_modal_tracking_tpu.utils.checkpoint import save_checkpoint

    datasets = names2datasets(args.datasets)
    sampler = TrackingSampler(datasets, None,
                              samples_per_epoch=args.samples_per_epoch,
                              max_gap=50, num_search_frames=1,
                              num_template_frames=1,
                              processing=lambda data, rng: dict(data, valid=True),
                              rgbt=False, seed=0)
    rng = np.random.default_rng(0)
    net, spec, state, step = build_refine_trainer(input_sz=args.input_sz,
                                                  lr=args.lr)
    os.makedirs(args.save_dir, exist_ok=True)
    for epoch in range(1, args.epochs + 1):
        losses = []
        for lo in range(0, args.samples_per_epoch, args.batch_size):
            samples = []
            for k in range(args.batch_size):
                d = sampler[lo + k]
                ref = d["template_images"][0]
                ref = ref[0] if isinstance(ref, list) else ref
                test = d["search_images"][0]
                test = test[0] if isinstance(test, list) else test
                rb = np.asarray(d["template_anno"][0], np.float32).reshape(-1)[-4:]
                tb = np.asarray(d["search_anno"][0], np.float32).reshape(-1)[-4:]
                samples.append((ref, rb, test, tb))
            state, metrics = step(state, batch_from_box_dataset(
                samples, args.input_sz, rng))
            losses.append(float(metrics["loss"]))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")
        save_checkpoint(args.save_dir, "AlphaRefine", epoch, state.variables)


if __name__ == "__main__":
    main()
