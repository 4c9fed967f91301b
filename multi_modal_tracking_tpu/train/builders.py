"""Dataset registry + dataloader construction.

Parity target: lib/train/base_functions.py — names2datasets (:33-160, the
19-name registry incl. RGBT names) and build_dataloaders (:163-284: RGBT vs
unimodal sampler/processing picked by dataset name; joint transforms gray 5% /
hflip 50%; train + optional val loaders).
"""
from __future__ import annotations

from typing import List

from multi_modal_tracking_tpu.train.data.loader import Loader
from multi_modal_tracking_tpu.train.data.processing import (RGBTProcessing,
                                                            UnimodalProcessing)
from multi_modal_tracking_tpu.train.data.sampler import TrackingSampler

RGBT_NAMES = {"VTUAV", "LasHeR", "RGBT234", "KAIST", "LLVIP", "M3FD",
              "DepthTrack", "DepthTrack-Train", "DepthTrack-Test",
              "DepthTrack_Train", "DepthTrack_Test",
              "VTUAV_Test", "VTUAV-Test", "SyntheticRGBT", "SyntheticRGBTHard",
              "SyntheticRGBTHardVisible"}


def names2datasets(names: List[str], image_loader=None):
    """Instantiate dataset adapters by registry name."""
    from multi_modal_tracking_tpu.train.data.datasets import (
        SyntheticRGBT, SyntheticRGBTHard, SyntheticVideo)
    from multi_modal_tracking_tpu.train.data.datasets import rgbt as R
    from multi_modal_tracking_tpu.train.data.datasets import unimodal as U
    kw = {} if image_loader is None else {"image_loader": image_loader}
    table = {
        "LasHeR": lambda: R.LasHeR(**kw),
        "RGBT234": lambda: R.RGBT234(**kw),
        "VTUAV": lambda: R.VTUAV(**kw),
        "VTUAV_Test": lambda: R.VTUAV(split_dirs=("test_data",), **kw),
        "DepthTrack": lambda: R.DepthTrack(**kw),
        # reference registry spellings (base_functions.py:52-56) + underscore twins
        "DepthTrack-Train": lambda: R.DepthTrack(split="train", **kw),
        "DepthTrack-Test": lambda: R.DepthTrack(split="test", **kw),
        "DepthTrack_Train": lambda: R.DepthTrack(split="train", **kw),
        "DepthTrack_Test": lambda: R.DepthTrack(split="test", **kw),
        "VTUAV-Test": lambda: R.VTUAV(split_dirs=("test_data",), **kw),
        "KAIST": lambda: R.KAIST(**kw),
        "LLVIP": lambda: R.LLVIP(**kw),
        "M3FD": lambda: R.M3FD(**kw),
        "LasHeR_T": lambda: R.LasHeR_TIR(**kw),
        "RGBT234_T": lambda: R.RGBT234_TIR(**kw),
        "LASOT": lambda: U.LaSOT(**kw),
        "GOT10K_vottrain": lambda: U.GOT10k(split="vottrain", **kw),
        "GOT10K_votval": lambda: U.GOT10k(split="votval", **kw),
        "GOT10K_train_full": lambda: U.GOT10k(split="train_full", **kw),
        "TRACKINGNET": lambda: U.TrackingNet(**kw),
        "COCO17": lambda: U.COCOSeq(**kw),
        "VID": lambda: U.ImagenetVID(**kw),
        "TNL2k": lambda: U.TNL2k(**kw),
        "SyntheticRGBT": lambda: SyntheticRGBT(),
        "SyntheticRGBTHard": lambda: SyntheticRGBTHard(),
        # stage-1 variant: more appearance diversity, occlusion-invisible
        # frames kept, but NO absence stretches — trident_pro's
        # allow_invisible searches would otherwise supervise the box head
        # on frames whose GT position holds no target pixels
        "SyntheticRGBTHardVisible": lambda: SyntheticRGBTHard(
            n_sequences=24, absent_every=0),
        "SyntheticVideo": lambda: SyntheticVideo(),
    }
    # LMDB twins (lib/train/dataset/*_lmdb.py, selected by settings.use_lmdb
    # in the reference; here addressable directly by suffixed name).
    from multi_modal_tracking_tpu.train.data.datasets import lmdb_twins as L
    table.update({
        "LASOT_lmdb": lambda: L.LaSOTLmdb(),
        "GOT10K_vottrain_lmdb": lambda: L.GOT10kLmdb(split="vottrain"),
        "GOT10K_votval_lmdb": lambda: L.GOT10kLmdb(split="votval"),
        "GOT10K_train_full_lmdb": lambda: L.GOT10kLmdb(split="train_full"),
        "TRACKINGNET_lmdb": lambda: L.TrackingNetLmdb(),
        "COCO17_lmdb": lambda: L.COCOSeqLmdb(),
        "VID_lmdb": lambda: L.ImagenetVIDLmdb(),
    })
    out = []
    for n in names:
        if n not in table:
            raise ValueError(f"Unknown dataset name {n}")
        out.append(table[n]())
    return out


def is_rgbt_config(cfg) -> bool:
    return any(n in RGBT_NAMES for n in cfg.DATA.TRAIN.DATASETS_NAME)


def build_dataloaders(cfg, seed: int = 0):
    """Build (train_loader, val_loader | None) from a config tree."""
    rgbt = is_rgbt_config(cfg)
    proc_cls = RGBTProcessing if rgbt else UnimodalProcessing
    import random as _random

    def make(split_cfg, name, train):
        rng = _random.Random(seed if train else seed + 1)
        processing = proc_cls(
            search_area_factor={"template": cfg.DATA.TEMPLATE.FACTOR,
                                "search": cfg.DATA.SEARCH.FACTOR},
            output_sz={"template": cfg.DATA.TEMPLATE.SIZE,
                       "search": cfg.DATA.SEARCH.SIZE},
            center_jitter_factor={"template": cfg.DATA.TEMPLATE.CENTER_JITTER,
                                  "search": cfg.DATA.SEARCH.CENTER_JITTER},
            scale_jitter_factor={"template": cfg.DATA.TEMPLATE.SCALE_JITTER,
                                 "search": cfg.DATA.SEARCH.SCALE_JITTER},
            rng=rng, train=train)
        # Multi-host: SAMPLE_PER_EPOCH is the GLOBAL per-epoch budget — each
        # process draws its share (DistributedSampler divides by world size
        # in the reference, base_functions.py:232). Without the split every
        # host would run the full budget, multiplying optimizer steps per
        # epoch by process_count and desynchronising the LR/CE epoch
        # schedules from trainer.steps_per_epoch.
        import jax
        sampler = TrackingSampler(
            datasets=names2datasets(split_cfg.DATASETS_NAME),
            p_datasets=split_cfg.DATASETS_RATIO,
            samples_per_epoch=max(1, split_cfg.SAMPLE_PER_EPOCH
                                  // jax.process_count()),
            max_gap=cfg.DATA.MAX_SAMPLE_INTERVAL,
            num_search_frames=1,
            num_template_frames=cfg.DATA.TEMPLATE.get("NUMBER", 1),
            processing=processing,
            frame_sample_mode=cfg.DATA.SAMPLER_MODE,
            train_cls=cfg.TRAIN.get("TRAIN_SCORE", False),
            rgbt=rgbt,
            seed=seed if train else seed + 1)
        # Multi-host: TRAIN.BATCH_SIZE is the GLOBAL batch; each process
        # loads its local slice (DistributedSampler analogue — the per-host
        # batches are assembled into one global sharded array by
        # parallel.distributed.shard_host_batch).
        import jax
        local_bsz = max(1, cfg.TRAIN.BATCH_SIZE // jax.process_count())
        return Loader(sampler, batch_size=local_bsz,
                      num_workers=cfg.TRAIN.NUM_WORKER, name=name, training=train,
                      epoch_interval=1 if train else cfg.TRAIN.VAL_EPOCH_INTERVAL)

    train_loader = make(cfg.DATA.TRAIN, "train", True)
    val_loader = None
    if cfg.DATA.get("VAL") and cfg.DATA.VAL.DATASETS_NAME:
        try:
            val_loader = make(cfg.DATA.VAL, "val", False)
        except ValueError:
            # unknown dataset name = config typo, not a missing download
            raise
        except Exception as e:
            # a val split pointing at data this machine doesn't have is
            # common (reference behaves the same by erroring later); run
            # without validation but say so
            print(f"[build_dataloaders] val loader disabled: {e!r}")
            val_loader = None
    return train_loader, val_loader
