"""GUI host parity: the Qt-free PluginRunner drives every reference
PluginWidget behaviour against a mock viewer (no napari needed).

Covers VERDICT round-1 "GUI host parity": run() signature introspection for
image2 / extra params (ref ``viewer.py:112-127``), async worker + busy
guard (``:329-392``), error-layer degradation (``:384-387``),
``requires_viewer`` handling (ref ``interface.py:18-25``), and the dataset
loader surface (``viewer.py:404-429``).
"""

import threading
import time

import numpy as np
import pytest

from pcmi_tpu import registry
from pcmi_tpu.interface import SatellitePlugin
from pcmi_tpu.viewer import (
    PluginRunner,
    add_layers,
    coerce_extras,
    demo_layers,
    list_samples,
    load_image,
    widget_spec,
)


class MockViewer:
    def __init__(self):
        self.layers = []

    def add_image(self, data, **params):
        self.layers.append(("image", np.asarray(data), params))

    def add_points(self, data, **params):
        self.layers.append(("points", np.asarray(data), params))

    def add_shapes(self, data, **params):
        self.layers.append(("shapes", np.asarray(data), params))

    def add_labels(self, data, **params):
        self.layers.append(("labels", np.asarray(data), params))


def test_stitching_introspection_and_run():
    """Two-image plugins are detected and runnable from the host — the
    exact gap the reference GUI covers with its image2 picker."""
    plugin = registry.create("stitching")
    runner = PluginRunner(plugin)
    assert runner.needs_image2()

    base = np.zeros((96, 128), np.float32)
    ys, xs = np.mgrid[0:96, 0:128]
    base += (np.sin(xs * 0.35) + np.cos(ys * 0.23) + 2.0) / 4.0
    rng = np.random.default_rng(0)
    base += rng.uniform(0, 0.3, base.shape).astype(np.float32)
    left = base[:, :88]
    right = base[:, 40:]

    viewer = MockViewer()
    runner.run(image=left, image2=right,
               on_done=lambda ls: add_layers(viewer, ls))
    assert runner.last_error is None
    assert viewer.layers, "stitching produced no layers"
    kinds = [k for k, _, _ in viewer.layers]
    assert "image" in kinds


def test_height_map_runner_via_extra_params():
    """The height-map plugin runs from the host through extra-param
    introspection (mode/n/seed fields) with sources attached — the
    reference's DisparityWidget path (``widget.py:98-147``)."""
    from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
    from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
    from pcmi_tpu.pipelines.height_map import HeightMapExtractor, HeightMapPipeline

    scene = make_stereo_scene(seed=0, out_shape=(128, 128),
                              ground_shape=(192, 192), h_range=(0.0, 20.0),
                              views=((8.0, 80.0), (16.0, 250.0)))
    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=7, census_window=5, margin_undefined=4),
        rectify=RectifyConfig(height_range=(0.0, 20.0)),
    )
    plugin = HeightMapExtractor(HeightMapPipeline(cfg))
    plugin.set_sources(scene.images, scene.rpcs, *aoi_lonlat_ranges(scene))

    runner = PluginRunner(plugin)
    extras = runner.extra_params()
    assert {"mode", "n", "seed"} <= set(extras)
    coerced = coerce_extras(runner, {"n": "1", "mode": "first"})
    assert coerced == {"n": 1, "mode": "first"}

    viewer = MockViewer()
    runner.run(on_done=lambda ls: add_layers(viewer, ls), **coerced)
    assert runner.last_error is None
    names = [p.get("name", "") for _, _, p in viewer.layers]
    assert any(n.startswith("disparity") for n in names)


def test_busy_guard_blocks_reentry():
    class Slow(SatellitePlugin):
        @property
        def name(self):
            return "slow"

        def run(self, image, viewer=None):
            time.sleep(0.4)
            return [(np.zeros((4, 4), np.float32), {"name": "ok"}, "image")]

    runner = PluginRunner(Slow())
    done = []
    worker = runner.run(image=np.zeros((4, 4), np.float32),
                        on_done=done.append, block=False)
    assert runner.busy
    with pytest.raises(RuntimeError):
        runner.run(image=np.zeros((4, 4), np.float32))
    worker.join()
    assert not runner.busy
    assert len(done) == 1
    # after completion it can run again
    runner.run(image=np.zeros((4, 4), np.float32), on_done=done.append)
    assert len(done) == 2


def test_error_becomes_error_layer():
    class Boom(SatellitePlugin):
        @property
        def name(self):
            return "boom"

        def run(self, image, viewer=None):
            raise ValueError("intentional")

    viewer = MockViewer()
    runner = PluginRunner(Boom())
    runner.run(image=np.zeros((6, 6), np.float32),
               on_done=lambda ls: add_layers(viewer, ls))
    assert "intentional" in runner.last_error
    assert len(viewer.layers) == 1
    kind, data, params = viewer.layers[0]
    assert kind == "image" and params["name"].startswith("ERROR")
    assert data.shape == (6, 6)


def test_requires_viewer_receives_handle():
    seen = {}

    class NeedsViewer(SatellitePlugin):
        @property
        def name(self):
            return "needs-viewer"

        @property
        def requires_viewer(self):
            return True

        def run(self, image, viewer=None):
            seen["viewer"] = viewer
            return []

    viewer = MockViewer()
    runner = PluginRunner(NeedsViewer(), viewer=viewer)
    runner.run(image=np.zeros((4, 4), np.float32))
    assert seen["viewer"] is viewer


def test_widget_spec_fields():
    plugin = registry.create("stitching")
    spec = widget_spec(PluginRunner(plugin))
    names = [f["name"] for f in spec["fields"]]
    assert names[0] == "image" and "image2" in names


def test_dataset_loader_lists_and_loads(tmp_path):
    from pcmi_tpu.io.raster import write_tiff

    d = tmp_path / "data" / "samples"
    d.mkdir(parents=True)
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    write_tiff(str(d / "sample.tif"), img)

    found = list_samples(str(tmp_path))
    assert len(found) == 1
    loaded = load_image(found[0])
    np.testing.assert_allclose(loaded, img)


def test_demo_layers_shapes():
    layers = demo_layers(seed=1)
    assert len(layers) >= 3
    kinds = {k for _, _, k in layers}
    assert kinds == {"image"}


def test_registry_member_groups():
    """Per-member grouping covers every registered plugin exactly once
    (ref viewer.py:436-492 tabs plugins by member)."""
    from pcmi_tpu import registry

    groups = registry.groups()
    grouped = [n for names in groups.values() for n in names]
    assert sorted(grouped) == registry.available()
    # the four member tabs of the reference all exist when nothing degraded
    if not registry.failures():
        assert {"jasraj", "marcin", "rafael", "stan"} <= set(groups)
