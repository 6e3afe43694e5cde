from cice5_tpu.utils.pytree import pytree_dataclass

__all__ = ["pytree_dataclass"]
