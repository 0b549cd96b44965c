"""Timed scopes + jax.profiler hooks + structured logging.

The reference's only observability is print statements and one log file
(SURVEY §5). Here: a ``scope`` context manager that times host+device
(blocking on device work), an aggregating registry for pipeline-stage
timings, and a thin wrapper over ``jax.profiler.trace`` for full XLA
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

import jax

logger = logging.getLogger("pcmi_tpu")

_STATS: Dict[str, list] = defaultdict(list)


def _device_sync() -> None:
    """True device barrier: fetch a trivial scalar enqueued AFTER pending
    work. Per-device in-order execution makes the fetch wait for everything
    queued before it — unlike ``jax.effects_barrier`` (drains effect tokens
    only) or, on some transports, even ``block_until_ready``."""
    try:
        float(jax.jit(lambda: jax.numpy.float32(0))())
    except Exception:
        pass


@contextlib.contextmanager
def scope(name: str, sync: bool = True, log: bool = False):
    """Time a block; ``sync=True`` blocks on outstanding device work so the
    measurement covers execution, not just dispatch."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            _device_sync()
        dt = time.perf_counter() - t0
        _STATS[name].append(dt)
        if log:
            logger.info("scope %s: %.1f ms", name, dt * 1e3)


def stats() -> Dict[str, dict]:
    out = {}
    for name, times in _STATS.items():
        out[name] = {
            "count": len(times),
            "total_s": sum(times),
            "mean_ms": 1e3 * sum(times) / len(times),
            "last_ms": 1e3 * times[-1],
        }
    return out


def reset_stats() -> None:
    _STATS.clear()


def dump_stats(path: Optional[str] = None) -> str:
    s = json.dumps(stats(), indent=2, sort_keys=True)
    if path:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(s)
    return s


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a full XLA/device profile (open with TensorBoard)."""
    with jax.profiler.trace(logdir):
        yield


def setup_logging(level: int = logging.INFO, path: Optional[str] = None):
    """Console (+optional file) logging — supersedes the reference's
    ``data/TEMP/log.txt`` append habit (``disparity/plugin.py:49-52``)."""
    handlers: list = [logging.StreamHandler()]
    if path:
        handlers.append(logging.FileHandler(path))
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )
    return logger
