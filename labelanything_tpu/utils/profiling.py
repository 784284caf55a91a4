"""Profiling, memory pre-flight and failure-detection helpers
(reference aux subsystems, SURVEY §5: the toy benchmark CLI cli.py:287-327,
allocate_memory experiment/utils.py:181-207, check_nan utils.py:139-157,
handle_oom utils.py:160-178).

TPU-native equivalents: ``jax.profiler`` traces, a compile-time memory
estimate from XLA's executable stats, and a NaN/batch dump hook.
"""

from __future__ import annotations

import contextlib
import pathlib
import pickle
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from .logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/XProf
    (replaces the reference's torch-free toy benchmark, cli.py:287-327)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", log_dir)


def estimate_step_memory(fn: Callable, *args,
                         donate_argnums: tuple = ()) -> Dict[str, float]:
    """Compile ``fn`` AOT and report XLA's memory analysis — the TPU
    equivalent of the reference's allocate_memory forward/backward probe
    (experiment/utils.py:181-207), without touching the device.

    With ``donate_argnums`` the analysis reflects donation: donated buffers
    reused for outputs appear as a NEGATIVE ``alias_bytes`` entry (counted
    once instead of on both the argument and output side). If the backend
    does not report ``alias_size_in_bytes`` the entry is omitted and a
    warning notes that the summed total OVER-COUNTS donated buffers —
    callers asserting a hard budget should treat that case as advisory,
    not a failure. Sum the returned values for the peak estimate."""
    lowered = jax.jit(fn, donate_argnums=donate_argnums).lower(*args)
    compiled = lowered.compile()
    analysis = None
    try:
        analysis = compiled.memory_analysis()
        stats = {
            "temp_bytes": getattr(analysis, "temp_size_in_bytes", None),
            "argument_bytes": getattr(analysis, "argument_size_in_bytes", None),
            "output_bytes": getattr(analysis, "output_size_in_bytes", None),
            "generated_code_bytes": getattr(
                analysis, "generated_code_size_in_bytes", None),
        }
    except Exception:  # memory analysis unsupported on some backends
        stats = {}
    stats = {k: v for k, v in stats.items() if v is not None}
    if donate_argnums and stats:
        aliased = getattr(analysis, "alias_size_in_bytes", None)
        if aliased is None:
            logger.warning(
                "memory preflight: backend reports no alias stats — the "
                "total over-counts donated buffers (donation not reflected)")
        else:
            stats["alias_bytes"] = -aliased
    total = sum(stats.values())
    logger.info("memory preflight: %s (total %.2f GB)",
                {k: f"{v/2**30:.2f}GB" for k, v in stats.items()},
                total / 2**30)
    return stats


def check_nan(loss_value: float, batch: Any, params: Any,
              dump_path: str = "nan_dump.pkl") -> None:
    """Raise on non-finite loss after dumping the offending batch AND model
    state (reference: experiment/utils.py:139-157 dumps model+batch to
    nan.pt)."""
    if np.isfinite(loss_value):
        return
    try:
        host_batch = jax.tree.map(np.asarray, batch)
        host_params = jax.tree.map(np.asarray, params)
        with open(dump_path, "wb") as f:
            pickle.dump({"batch": host_batch, "params": host_params,
                         "loss": loss_value}, f)
        logger.error("non-finite loss %s; batch dumped to %s",
                     loss_value, dump_path)
    except Exception as exc:
        logger.error("non-finite loss %s (dump failed: %s)", loss_value, exc)
    raise FloatingPointError(f"non-finite loss: {loss_value}")
