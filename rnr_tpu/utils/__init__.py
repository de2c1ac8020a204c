"""Auxiliary subsystems: evaluation metrics, tracing/profiling, logging."""

from rnr_tpu.utils.eval_metrics import compute_err_metrics, compute_err_metrics_batch
from rnr_tpu.utils.trace import StepTimer, trace_context
