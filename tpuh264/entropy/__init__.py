from .cavlc import encode_residual_block, decode_residual_block

__all__ = ["encode_residual_block", "decode_residual_block"]
