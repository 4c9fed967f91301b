from multi_modal_tracking_tpu.ops import boxes  # noqa: F401
