"""VOT2020 entry module (parity: external/AR/pytracking/
VOT2020_super_only_mask_384_HP/mixformer_alpha_seg_class.py): box tracking +
Alpha-Refine mask, reported via trax."""
from multi_modal_tracking_tpu.eval.vot import run_vot20_mask_exp

run_vot20_mask_exp("mixformer_vit", training_yaml="baseline",
                   checkpoint=None, refine_checkpoint=None)
