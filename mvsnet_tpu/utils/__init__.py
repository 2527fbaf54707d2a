"""Shared utilities: logging, paths, metrics sinks."""

from mvsnet_tpu.utils.logging import setup_logger  # noqa: F401
from mvsnet_tpu.utils.paths import ckpt_dir, mkdir_p  # noqa: F401
