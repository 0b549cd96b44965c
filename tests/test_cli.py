"""Registry + CLI + profiling utils."""

import json
import os

import numpy as np
import pytest

from pcmi_tpu import registry
from pcmi_tpu.cli import main as cli_main
from pcmi_tpu.io.raster import read_tiff, write_tiff
from pcmi_tpu.utils import dump_stats, reset_stats, scope, stats


EXPECTED_PLUGINS = {
    "height-map", "saliency", "restoration", "stitching", "land-use",
    "detection", "super-resolution", "inpainting", "generative-restoration",
}


def test_registry_has_all_builtin_plugins():
    names = set(registry.available())
    missing = EXPECTED_PLUGINS - names
    assert not missing, f"missing plugins: {missing}; failures: {registry.failures()}"


def test_registry_create_and_unknown():
    p = registry.create("saliency")
    assert p.name == "Saliency Detection"
    with pytest.raises(KeyError):
        registry.create("nope")


def test_cli_list(capsys):
    assert cli_main(["list"]) == 0
    out = capsys.readouterr().out
    assert "saliency" in out and "height-map" in out


def test_cli_run_saliency(tmp_path, rng, capsys):
    img = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    img[60:70, 60:70] += 2.0
    src = str(tmp_path / "in.tif")
    write_tiff(src, img)
    out = str(tmp_path / "out")
    assert cli_main(["run", "saliency", "--input", src, "--output", out]) == 0
    files = capsys.readouterr().out.splitlines()
    assert any(f.endswith("saliency.tif") for f in files)
    sal = read_tiff(os.path.join(out, "saliency.tif"))
    assert sal.shape == img.shape


def test_cli_stitching_two_inputs(tmp_path, rng, capsys):
    base = rng.uniform(0, 1, (96, 160)).astype(np.float32)
    for _ in range(2):
        base = 0.5 * base + 0.25 * np.roll(base, 1, 0) + 0.25 * np.roll(base, 1, 1)
    a = str(tmp_path / "a.tif")
    b = str(tmp_path / "b.tif")
    write_tiff(a, base[:, :100])
    write_tiff(b, base[:, 60:])
    out = str(tmp_path / "out")
    assert cli_main(["run", "stitching", "--input", a, "--input2", b,
                     "--output", out]) == 0
    assert os.path.exists(os.path.join(out, "mosaic.tif"))


def test_profiling_scope():
    reset_stats()
    with scope("unit"):
        sum(range(1000))
    s = stats()
    assert s["unit"]["count"] == 1 and s["unit"]["mean_ms"] >= 0
    text = dump_stats()
    assert json.loads(text)["unit"]["count"] == 1
