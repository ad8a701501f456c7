from .ffdec import decode_with_libav, libav_available

__all__ = ["decode_with_libav", "libav_available"]
