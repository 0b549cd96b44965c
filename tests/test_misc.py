"""NITF image roundtrips, SR pairs, visualization, CLI error degradation."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcmi_tpu.io.nitf import NITFMetadata, parse_nitf_tres, read_nitf_image, write_nitf
from pcmi_tpu.models.training import make_sr_pairs
from pcmi_tpu.utils.visualize import (
    normalise_for_display,
    render,
    save_disparity,
    turbo_colormap,
)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_nitf_image_roundtrip(tmp_path, rng, dtype):
    img = rng.uniform(0, 200, (37, 53)).astype(dtype)
    p = str(tmp_path / "t.ntf")
    write_nitf(p, img)
    np.testing.assert_array_equal(read_nitf_image(p), img)


def test_nitf_with_rpc_tre_full_ingest(tmp_path, rng):
    from test_io import _rpc00b_payload

    payload = _rpc00b_payload()
    tres = b"RPC00B" + f"{len(payload):05d}".encode() + payload
    img = rng.uniform(0, 1, (20, 30)).astype(np.float32)
    p = str(tmp_path / "t2.ntf")
    write_nitf(p, img, tres=tres, idatim="20190402110425")
    meta = NITFMetadata.from_tags(parse_nitf_tres(p), path=p)
    assert meta.rpc is not None
    assert meta.datetime_str == "20190402110425"
    np.testing.assert_array_equal(read_nitf_image(p), img)


def test_nitf_rejects_unsupported_compression(tmp_path, rng):
    # C8 (JPEG2000) is supported now; legacy JPEG (C3) is not — the reader
    # must fail loudly, not return garbage. Patching IC in-place shifts the
    # subheader layout (COMRAT appears), so rebuild the expectation on the
    # error alone.
    img = rng.uniform(0, 200, (16, 16)).astype(np.uint8)
    p = str(tmp_path / "c.ntf")
    write_nitf(p, img)
    blob = bytearray(open(p, "rb").read())
    idx = blob.find(b"NC", 400)  # IC field in the image subheader
    blob[idx:idx + 2] = b"C3"
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        read_nitf_image(p)


def test_make_sr_pairs(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 33, 37, 3)), jnp.float32)
    lr, hr = make_sr_pairs(imgs, factor=4)
    assert hr.shape == (2, 32, 36, 3)
    assert lr.shape == (2, 8, 9, 3)
    # box mean: first LR pixel == mean of the 4x4 HR block
    np.testing.assert_allclose(
        np.asarray(lr[0, 0, 0]), np.asarray(hr[0, :4, :4]).mean((0, 1)),
        rtol=1e-5,
    )


def test_visualize_render_and_nan(tmp_path):
    img = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
    img[10, 10] = np.nan
    rgb = render(img, colormap="turbo")
    assert rgb.shape == (64, 64, 3) and rgb.dtype == np.uint8
    assert tuple(rgb[10, 10]) == (255, 0, 0)  # NaN painted red
    t = turbo_colormap(np.array([0.15, 0.5, 1.0]))
    assert t.shape == (3, 3)
    assert t[0, 2] > t[0, 0]       # low range is blue-dominant
    assert t[1, 1] > t[1, 0] and t[1, 1] > t[1, 2]  # mid is green
    assert t[2, 0] > t[2, 2]       # high end is red-dominant
    x = normalise_for_display(np.full((4, 4), np.nan))
    assert (x == 0).all()
    save_disparity(str(tmp_path / "d.png"), img, valid=np.isfinite(img))


def test_cli_error_degrades(tmp_path, rng, capsys):
    from pcmi_tpu.cli import main as cli_main
    from pcmi_tpu.io.raster import write_tiff

    src = str(tmp_path / "x.tif")
    write_tiff(src, rng.uniform(0, 1, (32, 32)).astype(np.float32))
    # stitching without image2 raises inside run() -> error layer written,
    # but the headless exit status reports the failure
    rc = cli_main(["run", "stitching", "--input", src,
                   "--output", str(tmp_path / "o")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "error" in err.lower()
    import os

    assert any(f.startswith("ERROR") for f in os.listdir(tmp_path / "o"))
    rc = cli_main(["run", "nope", "--input", src])
    assert rc == 2


def test_config_validation_errors():
    import pytest as _pytest

    from pcmi_tpu.config import RectifyConfig, StereoConfig

    with _pytest.raises(ValueError, match="census_window"):
        StereoConfig(census_window=9)
    with _pytest.raises(ValueError, match="census_window"):
        StereoConfig(census_window=4)
    with _pytest.raises(ValueError, match="4-path"):
        StereoConfig(sgm_paths=8)
    with _pytest.raises(ValueError, match="cost_type"):
        StereoConfig(cost_type="mi")
    with _pytest.raises(ValueError, match="bilinear"):
        RectifyConfig(interp_order=3)
    # max_disp rounds up to /16
    assert StereoConfig(max_disp=70).max_disp == 80


def test_device_trace_and_scope(tmp_path):
    import os

    import jax.numpy as jnp

    from pcmi_tpu.utils import device_trace, reset_stats, scope, stats

    reset_stats()
    with device_trace(str(tmp_path)):
        with scope("traced"):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    files = [f for _, _, fs in os.walk(str(tmp_path)) for f in fs]
    assert files, "profiler produced no trace files"
    assert "traced" in stats()
