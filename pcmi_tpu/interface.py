"""Plugin contract — API-compatible with the reference's ``interface.py``.

The reference defines a ``SatellitePlugin`` ABC (reference ``interface.py:10-47``)
whose ``run(image, viewer=None)`` returns a list of napari-style layer tuples
``(data, params, layer_type)`` (reference ``interface.py:5-7``). We keep that
exact surface so a napari host can consume our components unchanged, but the
framework itself never requires Qt/napari: every component is a plain callable
over arrays, and the plugin class is a thin adapter.

Differences from the reference (deliberate):

* ``run`` may accept and return JAX arrays; adapters convert at the boundary.
* Components expose their jittable core separately (``__call__`` on the
  pipeline object) so they can be composed, pjit-ed and benchmarked headless.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Literal, Tuple

import numpy as np

LayerType = Literal["image", "labels", "points", "shapes"]
LayerParams = Dict[str, Any]
Layer = Tuple[np.ndarray, LayerParams, LayerType]


class SatellitePlugin(ABC):
    """Abstract component contract (parity: reference ``interface.py:10-47``)."""

    @property
    @abstractmethod
    def name(self) -> str:
        """Display name of the component."""

    @property
    def requires_viewer(self) -> bool:
        """Whether ``run`` needs access to the full viewer (default False)."""
        return False

    @abstractmethod
    def run(self, image: np.ndarray, viewer=None) -> List[Layer]:
        """Run the component on ``image`` and return napari-style layers.

        Returns a list of ``(data, params, layer_type)`` tuples where
        ``layer_type`` is one of ``image | labels | points | shapes`` and
        ``params`` carries display hints (``name``, ``colormap``, ...).
        """


def as_numpy_layers(layers: List[Layer]) -> List[Layer]:
    """Materialise any JAX arrays in a layer list as host numpy arrays."""
    out: List[Layer] = []
    for data, params, kind in layers:
        out.append((np.asarray(data), dict(params), kind))
    return out
