"""Mesh-parallel execution layer: channel sharding, distributed four-step
FFT, and streaming overlap-save convolution (SURVEY §2.8)."""

from .channelizer import Channelizer
from .convolve import OverlapSaveConv
from .four_step import FourStepPlan
from .mesh import (CHANNEL_AXIS, FFT_AXIS, channel_sharding, make_mesh,
                   replicated)
from .multihost import initialize_multihost, pod_mesh

__all__ = ["Channelizer", "FourStepPlan", "OverlapSaveConv", "CHANNEL_AXIS",
           "FFT_AXIS", "channel_sharding", "make_mesh", "replicated",
           "initialize_multihost", "pod_mesh"]
