"""Config, logging and profiling utilities."""

from vnl_tpu.utils.config import load_config, apply_overrides
from vnl_tpu.utils.logging import MetricsLogger
