"""Auxiliary subsystems: checkpointing, profiling, logging."""

from .checkpoint import load_checkpoint, save_checkpoint
from .stats import RateMeter, roofline_report

__all__ = ["RateMeter", "load_checkpoint", "roofline_report", "save_checkpoint"]
