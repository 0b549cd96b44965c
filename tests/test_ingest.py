"""Disk-to-cloud end-to-end: synthetic NTFs on disk -> ingest -> fused DSM.

The strongest parity test in the suite: the synthetic scene is serialised
as real NITF files (RPC00B + USE00A + CSEXRA TREs, uncompressed imagery),
rediscovered from the directory, cropped to a KML AOI via the parsed RPCs,
and fused — exercising every ingest stage a reference user relies on GDAL
for, with exact ground truth at the end.
"""

import numpy as np
import pytest

from pcmi_tpu.config import PipelineConfig, RectifyConfig, StereoConfig
from pcmi_tpu.geometry.synthetic import aoi_lonlat_ranges, make_stereo_scene
from pcmi_tpu.io.nitf import csexra_tre, rpc00b_tre, use00a_tre, write_nitf
from pcmi_tpu.pipelines.ingest import discover_acquisitions, prepare_aoi_stack
from pcmi_tpu.pipelines.multiday import MultiDayFusion

VIEWS = ((10.0, 80.0), (20.0, 250.0))
# RPC00B carries offsets at fixed ASCII precision; pick representable anchors
ORIGIN = (-58.58, -34.49)


@pytest.fixture(scope="module")
def ntf_dir(tmp_path_factory):
    scene = make_stereo_scene(
        seed=3, out_shape=(256, 256), ground_shape=(384, 384),
        h_range=(0.0, 30.0), views=VIEWS, origin_lonlat=ORIGIN,
    )
    d = tmp_path_factory.mktemp("wv3")
    for i, (inc, az) in enumerate(VIEWS):
        img = np.asarray(scene.images[i], np.float32)
        tres = (rpc00b_tre(scene.rpcs[i]) + use00a_tre(inc)
                + csexra_tre(inc, az))
        write_nitf(str(d / f"acq_{i}.ntf"), img, tres=tres,
                   idatim=f"2019{4 + i:02d}02110000")
    lon_r, lat_r = aoi_lonlat_ranges(scene)
    # shrink the AOI so cropping does real work
    lon_mid = 0.5 * (lon_r[0] + lon_r[1])
    lat_mid = 0.5 * (lat_r[0] + lat_r[1])
    lon_r = (lon_mid + 0.4 * (lon_r[0] - lon_mid), lon_mid + 0.4 * (lon_r[1] - lon_mid))
    lat_r = (lat_mid + 0.4 * (lat_r[0] - lat_mid), lat_mid + 0.4 * (lat_r[1] - lat_mid))
    kml = d / "aoi.kml"
    kml.write_text(
        '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
        "<Placemark><Polygon><outerBoundaryIs><LinearRing><coordinates>"
        f"{lon_r[0]},{lat_r[0]},0 {lon_r[1]},{lat_r[0]},0 "
        f"{lon_r[1]},{lat_r[1]},0 {lon_r[0]},{lat_r[1]},0 "
        f"{lon_r[0]},{lat_r[0]},0"
        "</coordinates></LinearRing></outerBoundaryIs></Polygon></Placemark></kml>"
    )
    return d, scene


def test_discovery_reads_tre_metadata(ntf_dir):
    d, scene = ntf_dir
    acqs = discover_acquisitions(str(d))
    assert len(acqs) == 2
    for acq, (inc, az) in zip(acqs, VIEWS):
        assert abs(acq.meta.incidence_deg - inc) < 0.01
        assert abs(acq.meta.azimuth_deg - az) < 0.01
        assert acq.meta.rpc is not None
        assert acq.shape == (256, 256)
    # dates parsed from IDATIM differ across acquisitions
    assert acqs[0].meta.date_days != acqs[1].meta.date_days


def test_full_disk_ingest_to_fused_cloud(ntf_dir):
    d, scene = ntf_dir
    acqs = discover_acquisitions(str(d))
    images, rpcs, metas, lon_r, lat_r = prepare_aoi_stack(
        acqs, kml_path=str(d / "aoi.kml"), pad=4, align=16,
    )
    assert len(images) == 2
    assert images[0].shape[0] < 256  # actually cropped

    cfg = PipelineConfig(
        stereo=StereoConfig(block_size=7, census_window=5, margin_undefined=6,
                            edge_dilation=4),
        rectify=RectifyConfig(height_range=(0.0, 30.0)),
    )
    fused = MultiDayFusion(cfg).run(
        images, rpcs, metas, lon_r, lat_r,
        points_per_pair=1 << 14, grid_cell=2.0,
    )
    dsm = np.asarray(fused.dsm)
    assert np.isfinite(dsm).sum() > 200

    # accuracy vs the original terrain (serialised-RPC precision included)
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    x0, y0 = fused.grid_origin
    ny, nx = dsm.shape
    cx, cy = np.meshgrid(x0 + (np.arange(nx) + 0.5) * fused.grid_cell,
                         y0 + (np.arange(ny) + 0.5) * fused.grid_cell)
    gx = (cx - ox) / scene.ground_gsd
    gy = (cy - oy) / scene.ground_gsd
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) & (gy >= 0) & (gy < terr.shape[0] - 1)
    tt = terr[np.clip(gy.astype(int), 0, terr.shape[0] - 1),
              np.clip(gx.astype(int), 0, terr.shape[1] - 1)]
    m = np.isfinite(dsm) & inb
    err = dsm[m] - tt[m]
    assert np.median(np.abs(err)) < 1.0
    assert float(np.sqrt(np.mean(err**2))) < 2.5

def test_cli_height_map_real_sources(ntf_dir, tmp_path, capsys):
    """CLI e2e (VERDICT r3 item 6): NITFs on disk -> ``height-map --images
    --kml`` -> canvas rasters + georeferenced DSM + PLY, asserted against
    the exact synthetic terrain (ref flow ``widget.py:98-147`` ->
    ``disparity/plugin.py:36-243``)."""
    from pcmi_tpu.cli import main as cli_main
    from pcmi_tpu.io.raster import read_geo, read_tiff

    d, scene = ntf_dir
    out = tmp_path / "hm"
    rc = cli_main([
        "height-map", "--images", str(d), "--kml", str(d / "aoi.kml"),
        "--output", str(out),
        "--set", "stereo.block_size=7", "--set", "stereo.census_window=5",
        "--set", "stereo.margin_undefined=6", "--set", "stereo.edge_dilation=4",
        "--set", "rectify.height_range=[0.0,30.0]",
    ])
    assert rc == 0
    import json as _json

    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["points"] > 500
    assert summary["valid_fraction"] > 0.05
    assert 5.0 <= summary["convergence_deg"] <= 45.0

    # PLY written with the reported point count
    ply = (out / "cloud.ply").read_bytes()
    header = ply.split(b"end_header")[0].decode()
    n_ply = int([ln for ln in header.splitlines()
                 if ln.startswith("element vertex")][0].split()[-1])
    assert n_ply == summary["points"]

    # Georeferenced DSM: place each cell via its GeoTIFF tags and compare
    # against the exact synthetic terrain.
    dsm = read_tiff(str(out / "dsm.tif"))
    geo = read_geo(str(out / "dsm.tif"))
    assert geo is not None
    sx, sy = geo["scale"]
    x0, ytop = geo["origin"]
    assert sx > 0 and sy > 0  # north-up convention (advisor r2 fix)
    ny, nx = dsm.shape
    cx, cy = np.meshgrid(x0 + (np.arange(nx) + 0.5) * sx,
                         ytop - (np.arange(ny) + 0.5) * sy)
    ox, oy = scene.ground_origin
    terr = np.asarray(scene.terrain)
    gx = (cx - ox) / scene.ground_gsd
    gy = (cy - oy) / scene.ground_gsd
    inb = (gx >= 0) & (gx < terr.shape[1] - 1) & (gy >= 0) & (gy < terr.shape[0] - 1)
    tt = terr[np.clip(gy.astype(int), 0, terr.shape[0] - 1),
              np.clip(gx.astype(int), 0, terr.shape[1] - 1)]
    m = np.isfinite(dsm) & inb
    assert m.sum() > 200
    err = dsm[m] - tt[m]
    assert np.median(np.abs(err)) < 1.0
    assert float(np.sqrt(np.mean(err**2))) < 2.5
