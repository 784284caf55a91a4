"""labelanything_tpu — TPU-native multi-class few-shot semantic segmentation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
pasqualedem/LabelAnything (ECAI 2025, arXiv 2407.02075), designed TPU-first:
channels-last layouts, static episode shape buckets, pjit/shard_map data
parallelism over device meshes, and Pallas kernels on the attention-heavy
paths.
"""

__version__ = "0.1.0"

from . import typing as la_typing  # noqa: F401

__all__ = ["la_typing", "__version__"]
