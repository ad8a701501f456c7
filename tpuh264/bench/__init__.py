from .harness import run_matrix, run_single

__all__ = ["run_matrix", "run_single"]
