"""Device-mesh + multi-host distribution layer.

Lazy imports: `multihost` workers must call jax.distributed.initialize
before anything touches the XLA backend, and importing the mesh module
pulls in kernel tables that would initialize it.
"""

__all__ = ["make_codec_mesh", "sharded_encode_step", "mesh", "multihost"]


def __getattr__(name):
    if name in ("make_codec_mesh", "sharded_encode_step"):
        from . import mesh

        return getattr(mesh, name)
    if name in ("mesh", "multihost"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
