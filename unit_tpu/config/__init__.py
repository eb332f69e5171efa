from .node import CfgNode
from .defaults import get_cfg, add_config

__all__ = ["CfgNode", "get_cfg", "add_config"]
