"""Native C++ raster runtime: build, parity with the Python codec, loader."""

import numpy as np
import pytest

from pcmi_tpu.io.raster import write_tiff
from pcmi_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip(f"native toolchain unavailable: {native.native_error()}")
    return lib


def test_native_reads_python_written_tiff(tmp_path, lib, rng):
    img = rng.normal(size=(123, 77)).astype(np.float32)
    p = str(tmp_path / "a.tif")
    write_tiff(p, img)
    with native.NativeRaster(p) as r:
        assert (r.height, r.width, r.channels) == (123, 77, 1)
        assert r.dtype == np.float32
        np.testing.assert_array_equal(r.read(), img)
        # windowed read
        np.testing.assert_array_equal(r.read(10, 20, 30, 40),
                                      img[10:40, 20:60])


def test_native_multiband_uint16(tmp_path, lib, rng):
    img = (rng.uniform(0, 65535, (64, 96, 3))).astype(np.uint16)
    p = str(tmp_path / "b.tif")
    write_tiff(p, img)
    with native.NativeRaster(p) as r:
        np.testing.assert_array_equal(r.read(), img)


def test_tile_loader_windows_and_cache(tmp_path, lib, rng):
    imgs = []
    paths = []
    for i in range(2):
        img = rng.normal(size=(300, 260)).astype(np.float32)
        p = str(tmp_path / f"s{i}.tif")
        write_tiff(p, img)
        imgs.append(img)
        paths.append(p)
    with native.TileLoader(paths, tile=128, cache_mb=8, threads=1) as ld:
        t00 = ld.get(0, 0, 0)
        np.testing.assert_array_equal(t00, imgs[0][:128, :128])
        t21 = ld.get(1, 2, 1)  # bottom partial tile: rows 256:300
        np.testing.assert_array_equal(t21, imgs[1][256:300, 128:256])
        # repeated get hits the cache and stays identical
        np.testing.assert_array_equal(ld.get(0, 0, 0), t00)
        with pytest.raises(IndexError):
            ld.get(0, 9, 0)


def test_read_tiff_fast_fallback_matches(tmp_path, rng):
    img = rng.normal(size=(50, 60)).astype(np.float32)
    p = str(tmp_path / "c.tif")
    write_tiff(p, img)
    np.testing.assert_array_equal(native.read_tiff_fast(p), img)
