"""Utilities: visualization, image conversion, logging."""

from gfla_tpu.utils.images import flow2color, tensor2im
from gfla_tpu.utils.visualizer import Visualizer

__all__ = ["flow2color", "tensor2im", "Visualizer"]
