from cice5_tpu.ops.tridiag import tridiag_solve

__all__ = ["tridiag_solve"]
