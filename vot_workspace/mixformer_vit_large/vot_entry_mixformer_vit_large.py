"""VOT2020 entry module for the ViT-Large config."""
from multi_modal_tracking_tpu.eval.vot import run_vot20_mask_exp

run_vot20_mask_exp("mixformer_vit", training_yaml="baseline_large",
                   checkpoint=None, refine_checkpoint=None)
