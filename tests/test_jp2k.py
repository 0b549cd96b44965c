"""JPEG2000 (NITF IC=C8) codec + ingest path.

Real WV3 deliveries arrive as JPEG2000 codestreams inside NITF (the
reference decoded them through GDAL, ``preprocessing.py:71-80``); these
tests fabricate C8 files with the in-repo writer and push them through the
same discovery/crop ingest the uncompressed path uses.
"""

import numpy as np
import pytest

from pcmi_tpu.io import jp2k
from pcmi_tpu.io.nitf import (
    csexra_tre,
    nitf_image_info,
    read_nitf_image,
    rpc00b_tre,
    use00a_tre,
    write_nitf,
)

pytestmark = pytest.mark.skipif(
    not jp2k.available(), reason="no JPEG2000 codec in environment"
)


def test_codestream_roundtrip_uint16(rng):
    img = rng.integers(0, 2048, (93, 171), dtype=np.uint16)  # 11-bit PAN
    data = jp2k.encode(img)
    assert jp2k.is_j2k(data)
    out = jp2k.decode(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img)


def test_codestream_roundtrip_uint8(rng):
    img = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    np.testing.assert_array_equal(jp2k.decode(jp2k.encode(img)), img)


def test_lossy_encode_is_close(rng):
    img = (np.indices((128, 128)).sum(0) * 8).astype(np.uint16)
    data = jp2k.encode(img, lossless=False, ratio=10.0)
    out = jp2k.decode(data).astype(np.float64)
    rmse = float(np.sqrt(np.mean((out - img) ** 2)))
    assert rmse < 40.0  # smooth ramp, 10:1 — should be near-transparent


def test_c8_nitf_roundtrip(tmp_path, rng):
    img = rng.integers(0, 2048, (120, 200), dtype=np.uint16)
    p = str(tmp_path / "c8.ntf")
    write_nitf(p, img, compress="C8")
    info = nitf_image_info(p)
    assert info["ic"] == "C8"
    assert (info["nrows"], info["ncols"]) == (120, 200)
    np.testing.assert_array_equal(read_nitf_image(p), img)


def test_c8_nitf_with_tres_through_ingest(tmp_path):
    from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
    from pcmi_tpu.pipelines.ingest import (
        discover_acquisitions,
        prepare_aoi_stack,
    )

    views = ((10.0, 80.0), (20.0, 250.0))
    scene = make_stereo_scene(
        seed=5, out_shape=(128, 128), ground_shape=(192, 192),
        h_range=(0.0, 20.0), views=views, origin_lonlat=(-58.58, -34.49),
    )
    quant = []
    for i, (inc, az) in enumerate(views):
        img = np.asarray(scene.images[i], np.float32)
        q = np.clip(img * 2047.0, 0, 2047).astype(np.uint16)
        quant.append(q)
        tres = (rpc00b_tre(scene.rpcs[i]) + use00a_tre(inc)
                + csexra_tre(inc, az))
        write_nitf(str(tmp_path / f"acq_{i}.ntf"), q, tres=tres,
                   idatim=f"2019{4 + i:02d}02110000", compress="C8")

    acqs = discover_acquisitions(str(tmp_path))
    assert len(acqs) == 2
    for acq, (inc, az) in zip(acqs, views):
        assert abs(acq.meta.incidence_deg - inc) < 0.01
        assert acq.meta.rpc is not None
        assert acq.shape == (128, 128)

    lon_r, lat_r = aoi_lonlat_ranges(scene)
    images, rpcs, metas, *_ = prepare_aoi_stack(
        acqs, lon_range=lon_r, lat_range=lat_r, pad=4, align=16,
    )
    assert len(images) == 2
    # the cropped window must be bit-identical to the source quantised data
    for crop, q in zip(images, quant):
        h, w = crop.shape
        found = False
        full = q.astype(np.float32)
        for oy in range(0, q.shape[0] - h + 1):
            if np.array_equal(full[oy:oy + h, :w], crop):
                found = True
                break
        assert found, "C8 decode corrupted the cropped window"


def test_corrupt_codestream_raises(tmp_path, rng):
    img = rng.integers(0, 2048, (64, 64), dtype=np.uint16)
    p = str(tmp_path / "bad.ntf")
    write_nitf(p, img, compress="C8")
    data = bytearray(open(p, "rb").read())
    info = nitf_image_info(p)
    off = int(info["data_offset"])
    data[off:off + 64] = bytes(64)  # wipe SOC/SIZ
    open(p, "wb").write(bytes(data))
    with pytest.raises(Exception):
        read_nitf_image(p)


def test_blocked_m8_multisegment_roundtrip(tmp_path, rng):
    """Blocked (NPPB-tiled, per-block codestreams + Blocked Image Mask)
    16-bit PAN plus a second uint8 MSI segment in ONE file — the
    multi-segment blocked shape real deliveries take (VERDICT r2 item 9)."""
    pan = rng.integers(0, 2048, (300, 500), dtype=np.uint16)
    msi = rng.integers(0, 256, (150, 250), dtype=np.uint8)
    p = str(tmp_path / "m8.ntf")
    write_nitf(p, [pan, msi], compress="M8", tile_size=128)
    info = nitf_image_info(p)
    assert info["ic"] == "M8" and info["n_segments"] == 2
    assert (info["nbpr"], info["nbpc"]) == (4, 3)  # ceil(500/128), ceil(300/128)
    assert (info["nppbh"], info["nppbv"]) == (128, 128)
    from pcmi_tpu.io.nitf import read_nitf_segments

    segs = read_nitf_segments(p)
    np.testing.assert_array_equal(segs[0], pan)
    np.testing.assert_array_equal(segs[1], msi)
    # second-segment header probe stands alone
    info1 = nitf_image_info(p, segment=1)
    assert (info1["nrows"], info1["ncols"]) == (150, 250)


def test_tiled_c8_single_codestream_roundtrip(tmp_path, rng):
    """NPJE-style C8: ONE internally J2K-tiled codestream with matching
    NITF block fields (uint8 — the available encoder mis-encodes tiled
    uint16; decode of real tiled streams rides the codec)."""
    img = rng.integers(0, 256, (260, 390), dtype=np.uint8)
    p = str(tmp_path / "c8t.ntf")
    write_nitf(p, img, compress="C8", tile_size=128)
    info = nitf_image_info(p)
    assert info["ic"] == "C8" and (info["nbpr"], info["nbpc"]) == (4, 3)
    np.testing.assert_array_equal(read_nitf_image(p), img)


def test_tiled_c8_uint16_rejected(tmp_path, rng):
    img = rng.integers(0, 2048, (64, 64), dtype=np.uint16)
    with pytest.raises(ValueError, match="M8"):
        write_nitf(str(tmp_path / "x.ntf"), img, compress="C8", tile_size=32)
