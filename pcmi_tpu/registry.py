"""Plugin registry with import-time graceful degradation.

Parity with the reference host's registration block (``viewer.py:25-73``):
every plugin import is wrapped so a missing optional dependency degrades to
a logged warning instead of killing the host — but unlike the reference,
registration is data-driven and the registry is usable headless (CLI,
tests, services) as well as from the napari adapter.
"""

from __future__ import annotations

import traceback
from typing import Callable, Dict, List, Optional

from pcmi_tpu.interface import SatellitePlugin

_FACTORIES: Dict[str, Callable[[], SatellitePlugin]] = {}
_FAILURES: Dict[str, str] = {}


def register(name: str, factory: Callable[[], SatellitePlugin]) -> None:
    _FACTORIES[name] = factory


def available() -> List[str]:
    _ensure_builtin()
    return sorted(_FACTORIES)


def failures() -> Dict[str, str]:
    _ensure_builtin()
    return dict(_FAILURES)


def create(name: str) -> SatellitePlugin:
    _ensure_builtin()
    if name not in _FACTORIES:
        raise KeyError(
            f"unknown plugin {name!r}; available: {', '.join(sorted(_FACTORIES))}"
        )
    return _FACTORIES[name]()


def groups() -> Dict[str, List[str]]:
    """Plugins grouped the way the reference host tabs them per member
    (``viewer.py:436-492``: Jasraj / Marcin / Rafael / Stan QTabWidgets).
    Only registered (non-degraded) plugins appear; plugins without a group
    land under "other"."""
    _ensure_builtin()
    out: Dict[str, List[str]] = {}
    for name in sorted(_FACTORIES):
        out.setdefault(_GROUPS.get(name, "other"), []).append(name)
    return out


_BUILTIN_SPECS = [
    # (registry name, module, attribute)
    ("height-map", "pcmi_tpu.pipelines.height_map", "HeightMapExtractor"),
    ("saliency", "pcmi_tpu.pipelines.saliency", "SaliencyDetector"),
    ("restoration", "pcmi_tpu.pipelines.restoration", "RestorationPlugin"),
    ("stitching", "pcmi_tpu.pipelines.stitching", "ImageStitchingPlugin"),
    ("land-use", "pcmi_tpu.pipelines.landuse", "LandUseClassificationPlugin"),
    ("detection", "pcmi_tpu.pipelines.detection", "ObjectAnnotationPlugin"),
    ("super-resolution", "pcmi_tpu.pipelines.superres", "SuperResolutionPlugin"),
    ("inpainting", "pcmi_tpu.pipelines.superres", "InpaintingPlugin"),
    ("generative-restoration", "pcmi_tpu.pipelines.generative",
     "RestorationGenerativePlugin"),
]

# member tabs of the reference host (viewer.py:436-492)
_GROUPS = {
    "restoration": "jasraj",
    "stitching": "jasraj",
    "land-use": "jasraj",
    "detection": "jasraj",
    "generative-restoration": "marcin",
    "height-map": "rafael",
    "saliency": "rafael",
    "super-resolution": "stan",
    "inpainting": "stan",
}

_loaded = False


def _ensure_builtin() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    import importlib

    for name, module, attr in _BUILTIN_SPECS:
        try:
            mod = importlib.import_module(module)
            cls = getattr(mod, attr)
            register(name, cls)
        except Exception:  # degrade, don't crash (ref viewer.py:29-66)
            _FAILURES[name] = traceback.format_exc(limit=1)
