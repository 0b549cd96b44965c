"""I/O layer: TIFF codec roundtrips, PLY, KML, RPC sidecars, NITF TREs, crops."""

import numpy as np
import pytest

from pcmi_tpu.io import (
    CropWindow,
    NITFMetadata,
    crop_window_from_extent,
    kml_extent,
    parse_nitf_tres,
    parse_rpc_sidecar,
    read_ply,
    read_tiff,
    shift_rpc,
    write_ply,
    write_tiff,
)
from pcmi_tpu.geometry.rpc import make_affine_rpc


KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document><Placemark>
<Polygon><outerBoundaryIs><LinearRing><coordinates>
-58.59,-34.495,0 -58.58,-34.495,0 -58.58,-34.485,0 -58.59,-34.485,0 -58.59,-34.495,0
</coordinates></LinearRing></outerBoundaryIs></Polygon>
</Placemark></Document></kml>"""


def test_kml_extent():
    (lo, hi), (la, lb) = kml_extent(KML)
    assert (lo, hi) == (-58.59, -58.58)
    assert (la, lb) == (-34.495, -34.485)


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.float32])
def test_tiff_roundtrip_gray(tmp_path, dtype, rng):
    img = (rng.uniform(0, 255, (37, 53))).astype(dtype)
    p = str(tmp_path / "x.tif")
    write_tiff(p, img, tags={"note": 1.5})
    back = read_tiff(p)
    np.testing.assert_array_equal(back, img)
    from pcmi_tpu.io import read_aux
    assert read_aux(p)["note"] == 1.5


def test_tiff_roundtrip_multiband(tmp_path, rng):
    img = rng.normal(size=(20, 31, 3)).astype(np.float32)
    p = str(tmp_path / "rgb.tif")
    write_tiff(p, img)
    back = read_tiff(p)
    np.testing.assert_array_equal(back, img)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    vals = rng.normal(size=100).astype(np.float32)
    p = str(tmp_path / "c.ply")
    write_ply(p, pts, vals)
    pts2, vals2 = read_ply(p)
    np.testing.assert_allclose(pts2, pts)
    np.testing.assert_allclose(vals2, vals)


RPC_TXT = "\n".join(
    ["LINE_OFF: +000512.00 pixels", "SAMP_OFF: +000512.00 pixels",
     "LAT_OFF: -34.49000000 degrees", "LONG_OFF: -58.58000000 degrees",
     "HEIGHT_OFF: +0025.000 meters", "LINE_SCALE: 000512.00 pixels",
     "SAMP_SCALE: 000512.00 pixels", "LAT_SCALE: +00.01000000 degrees",
     "LONG_SCALE: +00.01000000 degrees", "HEIGHT_SCALE: +0050.000 meters"]
    + [f"LINE_NUM_COEFF_{i+1}: {v:+.9E}" for i, v in
       enumerate([-0.1, 0.1, 1.0, 0.1] + [0.0] * 16)]
    + [f"LINE_DEN_COEFF_{i+1}: {v:+.9E}" for i, v in
       enumerate([1.0] + [0.0] * 19)]
    + [f"SAMP_NUM_COEFF_{i+1}: {v:+.9E}" for i, v in
       enumerate([0.1, 1.0, 0.2, 0.05] + [0.0] * 16)]
    + [f"SAMP_DEN_COEFF_{i+1}: {v:+.9E}" for i, v in
       enumerate([1.0] + [0.0] * 19)]
)


def test_rpc_txt_sidecar_matches_reference_camera():
    tags = parse_rpc_sidecar(RPC_TXT)
    from pcmi_tpu.geometry.rpc import RPCCamera
    cam = RPCCamera.from_dict(tags)
    ref = make_affine_rpc(
        np.array([0.1, 1.0, 0.2, 0.05]), np.array([-0.1, 0.1, 1.0, 0.1])
    )
    col1, row1 = cam.project_np([-58.584], [-34.488], [10.0])
    col2, row2 = ref.project_np([-58.584], [-34.488], [10.0])
    np.testing.assert_allclose(col1, col2, atol=1e-6)
    np.testing.assert_allclose(row1, row2, atol=1e-6)


def _rpc00b_payload():
    """Build a synthetic RPC00B TRE body (STDI-0002 fixed widths)."""
    def f12(v):
        return f"{v:+.6E}".replace("E+0", "E+").replace("E-0", "E-")[:12].ljust(12)

    s = "1" + "0000.00" + "0000.00"
    s += "000512" + "00512" + "-34.4900" + "-058.5800" + "+0025"
    s += "000512" + "00512" + "+00.0100" + "+000.0100" + "+0050"
    line_num = [-0.1, 0.1, 1.0, 0.1] + [0.0] * 16
    den = [1.0] + [0.0] * 19
    samp_num = [0.1, 1.0, 0.2, 0.05] + [0.0] * 16
    for coeffs in [line_num, den, samp_num, den]:
        for v in coeffs:
            s += f12(v)
    return s.encode("ascii")


def test_nitf_tre_scan(tmp_path):
    payload = _rpc00b_payload()
    # STDI-0002 offsets: USE00A OBL_ANG at [21:26]; CSEXRA
    # OBLIQUITY_ANGLE at [91:97], AZ_OF_OBLIQUITY at [97:104]
    use00a = (" " * 21 + "24.50" + " " * 81).encode("ascii")[:107]
    csexra = (" " * 91 + "024.50" + "0132.70" + " " * 30).encode("ascii")
    blob = (
        b"NITF02.10" + b"03" + b"BF01" + b"0" * 10 + b"20190402110425"
        + b"\0" * 100
        + b"USE00A" + f"{len(use00a):05d}".encode() + use00a
        + b"CSEXRA" + f"{len(csexra):05d}".encode() + csexra
        + b"RPC00B" + f"{len(payload):05d}".encode() + payload
        + b"\0" * 64
    )
    p = tmp_path / "img.ntf"
    p.write_bytes(blob)
    tags = parse_nitf_tres(str(p))
    assert tags["IDATIM"] == "20190402110425"
    assert abs(tags["OBL_ANG"] - 24.5) < 1e-9
    assert abs(tags["AZ_OF_OBLIQUITY"] - 132.7) < 1e-9
    meta = NITFMetadata.from_tags(tags, path=str(p))
    assert meta.rpc is not None
    assert abs(meta.incidence_deg - 24.5) < 1e-9
    v = meta.get_view_vector()
    assert abs(np.linalg.norm(v) - 1) < 1e-9 and v[2] > 0.9
    assert meta.date_days > 7000  # 2019 vs 2000 epoch


def test_crop_window_and_rpc_shift():
    rpc = make_affine_rpc(
        np.array([0.0, 1.0, 0.0, 0.0]), np.array([0.0, 0.0, 1.0, 0.0])
    )
    win = crop_window_from_extent(
        rpc, (-58.585, -58.575), (-34.495, -34.485), (1024, 1024),
        pad=4, align=16,
    )
    assert isinstance(win, CropWindow)
    assert win.x_off % 16 == 0 and win.y_off % 16 == 0
    assert win.width > 0 and win.height > 0
    rpc2 = shift_rpc(rpc, win)
    col, row = rpc.project_np([-58.58], [-34.49], [0.0])
    col2, row2 = rpc2.project_np([-58.58], [-34.49], [0.0])
    np.testing.assert_allclose(col - col2, win.x_off, atol=1e-5)
    np.testing.assert_allclose(row - row2, win.y_off, atol=1e-5)
    # AOI outside the image must raise
    with pytest.raises(ValueError):
        crop_window_from_extent(rpc, (10.0, 10.1), (10.0, 10.1), (64, 64))


def test_geotiff_tags_roundtrip(tmp_path):
    """write_tiff(geo=...) emits real GeoTIFF tags (pixel scale, tiepoint,
    GeoKeys) that read_geo recovers — and the raster still reads back."""
    from pcmi_tpu.io.raster import read_geo, read_tiff, write_tiff

    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "geo.tif")
    write_tiff(p, img, geo={"origin": (11.25, 47.5),
                            "scale": (1e-5, -1e-5), "epsg": 4326})
    np.testing.assert_array_equal(read_tiff(p), img)
    g = read_geo(p)
    assert g is not None
    np.testing.assert_allclose(g["origin"], (11.25, 47.5))
    np.testing.assert_allclose(g["scale"], (1e-5, -1e-5))
    assert g["epsg"] == 4326

    # local/engineering frame: no EPSG, keys mark the CRS user-defined
    p2 = str(tmp_path / "local.tif")
    write_tiff(p2, img, geo={"origin": (100.0, 250.0), "scale": (1.0, -1.0)})
    g2 = read_geo(p2)
    assert g2["epsg"] is None
    np.testing.assert_allclose(g2["origin"], (100.0, 250.0))

    # plain write: no geo tags
    p3 = str(tmp_path / "plain.tif")
    write_tiff(p3, img)
    assert read_geo(p3) is None


def test_cli_north_up_geotiff(tmp_path):
    """CLI DSM products are north-up GeoTIFFs: positive ScaleY, tiepoint at
    the max-y outer corner, rows flipped so row 0 is the northernmost —
    the convention GDAL/QGIS read without GTIFF_HONOUR_NEGATIVE_SCALEY."""
    from pcmi_tpu.cli import _write_north_up
    from pcmi_tpu.io.raster import read_geo, read_tiff

    ny, nx, cell = 5, 4, 2.0
    dsm = np.arange(ny * nx, dtype=np.float32).reshape(ny, nx)  # row 0 at min-y
    p = str(tmp_path / "dsm.tif")
    _write_north_up(p, dsm, origin_min_xy=(100.0, 200.0), cell=cell)
    g = read_geo(p)
    assert g["scale"][1] > 0, "ScaleY must be positive (north-up)"
    np.testing.assert_allclose(g["origin"], (100.0, 200.0 + ny * cell))
    img = read_tiff(p)
    # pixel (row r, col c) maps to model Y = Y0 - (r + .5) * sy; the cell
    # at max model-y (r=0) must hold the LAST row of the min-y-first grid
    np.testing.assert_array_equal(img[0], dsm[-1])
    np.testing.assert_array_equal(img[-1], dsm[0])
