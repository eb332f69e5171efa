"""Serving & deployment: StableHLO export + HTTP inference server.

Beyond-reference subsystem (the reference ships no serving path): see
export.py / server.py docstrings.
"""

from .export import ExportedPredictor, describe, export_predict, load_exported
from .server import DetectionServer, DetectionService

__all__ = [
    "DetectionServer",
    "DetectionService",
    "ExportedPredictor",
    "describe",
    "export_predict",
    "load_exported",
]
