from .mesh import make_codec_mesh, sharded_encode_step

__all__ = ["make_codec_mesh", "sharded_encode_step"]
