"""Profiling, logging, checkpoint helpers."""

from pcmi_tpu.utils.profiling import (
    device_trace,
    dump_stats,
    reset_stats,
    scope,
    setup_logging,
    stats,
)

__all__ = [
    "device_trace",
    "dump_stats",
    "reset_stats",
    "scope",
    "setup_logging",
    "stats",
]
