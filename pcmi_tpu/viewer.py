"""Optional napari host — thin adapter over the plugin registry.

Parity with the reference host (``viewer.py:400-494``): one dock widget per
registered plugin, background execution, returned layer tuples added via
``viewer.add_<layer_type>``. The framework itself never requires Qt: this
module imports napari lazily and every capability is reachable through
:mod:`pcmi_tpu.cli` headless (the reference's GUI-only entry is called out
as a weakness in SURVEY §7 step 6).
"""

from __future__ import annotations

from typing import List

import numpy as np

from pcmi_tpu import registry
from pcmi_tpu.interface import Layer


def add_layers(viewer, layers: List[Layer]) -> None:
    """Add layer tuples to a napari viewer (ref ``viewer.py:370-378``)."""
    for data, params, kind in layers:
        getattr(viewer, f"add_{kind}")(np.asarray(data), **params)


def main() -> int:
    try:
        import napari
        from magicgui import magicgui
    except Exception as exc:  # headless image: degrade with instructions
        print(f"napari unavailable ({exc}); use the headless CLI: "
              f"python -m pcmi_tpu --help")
        return 1

    viewer = napari.Viewer(title="pcmi_tpu")

    for name in registry.available():
        plugin = registry.create(name)

        def make_runner(p):
            @magicgui(call_button=f"Run {p.name}")
            def runner():
                sel = viewer.layers.selection.active
                if sel is None:
                    return
                layers = p.run(np.asarray(sel.data))
                add_layers(viewer, layers)

            return runner

        viewer.window.add_dock_widget(make_runner(plugin), name=plugin.name)

    napari.run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
