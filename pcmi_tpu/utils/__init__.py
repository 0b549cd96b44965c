"""Profiling, logging, checkpoint helpers."""

from pcmi_tpu.utils.profiling import (
    device_trace,
    dump_stats,
    reset_stats,
    scope,
    setup_logging,
    stats,
)
from pcmi_tpu.utils.visualize import (
    normalise_for_display,
    render,
    save_disparity,
    save_image,
    turbo_colormap,
)

__all__ = [
    "normalise_for_display",
    "render",
    "save_disparity",
    "save_image",
    "turbo_colormap",
    "device_trace",
    "dump_stats",
    "reset_stats",
    "scope",
    "setup_logging",
    "stats",
]
