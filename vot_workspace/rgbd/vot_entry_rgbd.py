"""VOT2022-RGBD entry (parity: lib/test/vot_rgbd_test/tracker_class.py
run_vot_exp :136-191): score-gated online bimodal tracker over color+depth."""
from multi_modal_tracking_tpu.eval.vot import run_vot_exp

# update_interval resolves to the reference's shipped behaviour (no
# UPDATE_INTERVALS entry for DepthTrack -> candidate never committed)
run_vot_exp("asymmetric_shared_online", training_yaml="baseline",
            channels="rgbd")
