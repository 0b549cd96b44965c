"""Sort-segmented reductions: the TPU-native substitute for scatter/gather.

Random-access scatter (``segment_sum``) and gather (``table[ids]``) run at
~140 M elements/s on TPU — they serialise on HBM random access. A
multi-operand sort streams at ~730 M elements/s, and associative scans are
pure streaming VPU work. Any "per-cell statistics, then per-point
comparison" pattern (robust gridding, voxel filters, per-cell z-gates) is
therefore ~an order of magnitude faster as:

  1. ONE ``lax.sort`` keyed on cell id, payloads carried along (no explicit
     permutation gathers),
  2. per-segment totals via a SEGMENTED scan (running sums reset at run
     boundaries — f32-safe: magnitudes stay per-segment, unlike the
     cumsum-difference trick which cancels catastrophically),
  3. a backward "propagate segment total to every member" scan,
  4. per-point elementwise work in the sorted domain,
  5. a single (optionally multi-payload) ``segment_sum`` only for the final
     grid write.

Measured on the bench rig (4.2 M points → 1 M cells): the 3-round robust
gate drops from 547 ms (12 scatters + 6 gathers) to ~1/7th with this
formulation (see ``bench.py`` fusion entry).

No counterpart in the reference: its fusion stage was advertised but never
implemented (SURVEY §2.2); scipy/PCL equivalents are host-side.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def sort_by_segment(ids: jnp.ndarray, *payloads: jnp.ndarray):
    """Sort ``ids`` ascending, carrying ``payloads`` along.

    Returns ``(ids_sorted, payloads_sorted..., boundary)`` where
    ``boundary[i]`` marks the first element of each equal-id run.
    """
    sorted_ops = jax.lax.sort((ids, *payloads), num_keys=1)
    ids_s = sorted_ops[0]
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]])
    return (*sorted_ops, boundary)


def _seg_run_sums(boundary: jnp.ndarray, vals: Sequence[jnp.ndarray]):
    """Running within-segment sums (reset at each boundary), one pass for
    all ``vals``."""

    def op(a, b):
        fa, *sa = a
        fb, *sb = b
        return (fa | fb, *[jnp.where(fb, y, x + y) for x, y in zip(sa, sb)])

    out = jax.lax.associative_scan(op, (boundary, *vals))
    return out[1:]


def _propagate_back(boundary: jnp.ndarray, vals: Sequence[jnp.ndarray]):
    """Give every element its segment's LAST value, one pass for all
    ``vals``.

    The last element of a segment is the one whose successor starts a new
    run; scanning the reversed arrays, those become carriers that override
    until the next (reversed) end-mark.
    """
    end = jnp.concatenate([boundary[1:], jnp.ones((1,), bool)])
    rend = end[::-1]

    def op(a, b):
        fa, *va = a
        fb, *vb = b
        return (fa | fb, *[jnp.where(fb, y, x) for x, y in zip(va, vb)])

    out = jax.lax.associative_scan(op, (rend, *[v[::-1] for v in vals]))
    return [o[::-1] for o in out[1:]]


def segment_totals_at_points(boundary: jnp.ndarray,
                             *vals: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-point segment totals of each of ``vals`` (sorted domain)."""
    runs = _seg_run_sums(boundary, vals)
    return tuple(_propagate_back(boundary, runs))


def robust_sigma_gate(
    boundary: jnp.ndarray,
    v: jnp.ndarray,
    w0: jnp.ndarray,
    sigma: float,
    rounds: int = 3,
) -> jnp.ndarray:
    """Iterated per-segment sigma-clipping weights (sorted domain).

    Per round: weighted mean/std per segment from totals, drop members
    beyond ``sigma`` stddevs, recompute from the survivors. Semantics match
    the scatter/gather formulation it replaces
    (:func:`pcmi_tpu.pipelines.streaming.dsm_update`'s tile-local gate) at
    ~an order of magnitude less HBM random access.
    """
    w = w0
    for _ in range(max(rounds, 1)):
        ws, vs, vq = segment_totals_at_points(boundary, w, w * v, w * v * v)
        mean = vs / jnp.maximum(ws, 1e-12)
        std = jnp.sqrt(jnp.maximum(vq / jnp.maximum(ws, 1e-12) - mean**2,
                                   0.0))
        keep = jnp.abs(v - mean) <= sigma * std + 1e-6
        w = w0 * keep
    return w
