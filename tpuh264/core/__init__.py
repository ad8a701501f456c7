from .bitstream import BitWriter, BitReader
from . import nal
from .params import SPS, PPS
from .sliceheader import SliceHeader

__all__ = ["BitWriter", "BitReader", "nal", "SPS", "PPS", "SliceHeader"]
