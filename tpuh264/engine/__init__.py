from .config import CodecConfig, RESOLUTIONS
from .encoder import EncoderSession, EncodedFrame
from .decoder import DecoderPool, DecoderSession
from .pipeline import Pipeline
from .ratecontrol import RateController
from .ring import FrameRing
from .metrics import StatsWindow
from . import sources

__all__ = [
    "CodecConfig",
    "RESOLUTIONS",
    "EncoderSession",
    "EncodedFrame",
    "DecoderPool",
    "DecoderSession",
    "Pipeline",
    "RateController",
    "FrameRing",
    "StatsWindow",
    "sources",
]
