"""Name -> callable registries.

The reference stack (ubc-vision/UniT) instantiates every component by name from
config through Detectron2 registries (see /root/reference/modeling/roi_heads/fast_rcnn.py:22,
weak_detector_fast_rcnn.py:21, visual_attention_head.py:20).  This module provides the
equivalent mechanism for the TPU rebuild so that the same YAML config surface drives
component construction.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable


class Registry:
    """A registry mapping names to objects (classes or factory functions)."""

    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise KeyError(
                f"An object named '{name}' was already registered in '{self._name}' registry!"
            )
        self._obj_map[name] = obj

    def register(self, obj: Any = None, *, name: str | None = None):
        """Use as decorator (``@registry.register()``) or call (``registry.register(obj)``)."""
        if obj is None:

            def deco(func_or_class):
                self._do_register(name or func_or_class.__name__, func_or_class)
                return func_or_class

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def get(self, name: str) -> Any:
        if name not in self._obj_map:
            raise KeyError(
                f"No object named '{name}' found in '{self._name}' registry! "
                f"Available: {sorted(self._obj_map)}"
            )
        return self._obj_map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterable:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()
