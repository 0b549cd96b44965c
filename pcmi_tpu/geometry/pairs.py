"""Multi-date stereo pair selection.

Re-implements the reference's ``PairSelector`` heuristics
(``pair_selector.py:47-99``, after Facciolo et al. §2.1): enumerate all
C(n, 2) image pairs across acquisition dates, compute the convergence angle
between per-image view vectors, keep pairs with 5° ≤ convergence ≤ 45° and
both incidence angles ≤ 40°, valid pairs first. Unlike the reference (which
preserves discovery order), valid pairs are ranked by closeness to an ideal
convergence angle, so "first N" takes the geometrically best pairs.

Metadata arrives as plain records, not NITF tags: the I/O layer
(:mod:`pcmi_tpu.io.nitf`) parses (incidence, azimuth, date) out of NTF/tag
dumps; synthetic scenes provide them directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from pcmi_tpu.config import PairSelectionConfig


def view_vector_np(incidence_deg: float, azimuth_deg: float) -> np.ndarray:
    """ENU unit vector to the satellite (ref ``nitf_utils.py:39-81``)."""
    inc = np.radians(incidence_deg)
    az = np.radians(azimuth_deg)
    return np.array(
        [np.sin(inc) * np.sin(az), np.sin(inc) * np.cos(az), np.cos(inc)]
    )


@dataclass(frozen=True)
class ImageMeta:
    """Per-acquisition metadata (ref ``ImageCandidate``, ``pair_selector.py:9-24``)."""

    index: int                    # position in the image list
    incidence_deg: float
    azimuth_deg: float
    date: float = 0.0             # days since an arbitrary epoch
    name: str = ""

    @property
    def view(self) -> np.ndarray:
        return view_vector_np(self.incidence_deg, self.azimuth_deg)


@dataclass(frozen=True)
class PairCandidate:
    """A scored stereo pair (ref ``PairCandidate``, ``pair_selector.py:27-39``)."""

    i: int
    j: int
    convergence_deg: float
    time_diff_days: float
    valid: bool
    score: float                  # lower is better among valid pairs


def convergence_angle_deg(a: ImageMeta, b: ImageMeta) -> float:
    d = float(np.clip(np.dot(a.view, b.view), -1.0, 1.0))
    return float(np.degrees(np.arccos(d)))


def select_pairs(
    metas: Sequence[ImageMeta],
    cfg: PairSelectionConfig = PairSelectionConfig(),
    ideal_convergence_deg: float = 20.0,
) -> List[PairCandidate]:
    """All C(n,2) pairs, valid ones first, ranked by geometry quality.

    Validity (ref ``pair_selector.py:84-95``): convergence within
    ``[min_convergence_deg, max_convergence_deg]`` and both incidences
    ≤ ``max_incidence_deg``. Invalid "late bloomers" are appended after all
    valid pairs (ref ``pair_selector.py:97-99``) so a caller asking for more
    pairs than are valid still gets a deterministic list.
    """
    out: List[PairCandidate] = []
    n = len(metas)
    for i in range(n):
        for j in range(i + 1, n):
            a, b = metas[i], metas[j]
            # NOTE: the reference re-orders each pair by sin(azimuth)
            # (``pair_selector.py:86-91``) to work around inverted disparity
            # colouring. Here the disparity sign is fixed in closed form by
            # the rectification geometry (``RectifiedGeometry.disp_gain``),
            # so the swap is unnecessary — and role assignment by index
            # keeps pair products deterministic for callers.
            conv = convergence_angle_deg(a, b)
            valid = (
                cfg.min_convergence_deg <= conv <= cfg.max_convergence_deg
                and a.incidence_deg <= cfg.max_incidence_deg
                and b.incidence_deg <= cfg.max_incidence_deg
            )
            score = abs(conv - ideal_convergence_deg)
            out.append(
                PairCandidate(
                    i=a.index, j=b.index, convergence_deg=conv,
                    time_diff_days=abs(a.date - b.date), valid=valid,
                    score=score,
                )
            )
    out.sort(key=lambda p: (not p.valid, p.score))
    return out


def take_pairs(
    pairs: Sequence[PairCandidate], n: int, valid_only: bool = True
) -> List[PairCandidate]:
    """First ``n`` pairs (ref first-N heuristic, ``plugin.py:70``)."""
    usable = [p for p in pairs if p.valid] if valid_only else list(pairs)
    return usable[:n]
