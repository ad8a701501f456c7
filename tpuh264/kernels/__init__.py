"""JAX/Pallas pixel-domain kernels: the TPU compute path of the codec.

All integer math here is bit-exact with tpuh264.golden (tests enforce it);
the golden model is the oracle, this package is the production path.
"""
