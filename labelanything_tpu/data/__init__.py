from .schema import flags_merge
from .synthetic import random_batch

__all__ = ["flags_merge", "random_batch"]
