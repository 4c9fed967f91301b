from multi_modal_tracking_tpu.config.node import CfgNode
from multi_modal_tracking_tpu.config.defaults import get_default_config

__all__ = ["CfgNode", "get_default_config"]
