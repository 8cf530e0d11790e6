"""Cross-cutting utilities: metrics, loggers, checkpointing, env config."""

from nlsh_tpu.utils import metrics  # noqa: F401
