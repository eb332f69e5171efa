from .node import CfgNode
from .defaults import get_cfg, add_config
from .validate import validate_registry_names

__all__ = ["CfgNode", "get_cfg", "add_config", "validate_registry_names"]
