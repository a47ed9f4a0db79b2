"""Golden tests for the pure-python shapefile reader/rasterizer
(s2s_ismr_tpu/viz/regions.py) — the replacement for Bar_plot.ipynb's
rasterio geometry_mask + geopandas region analysis (cells 12-19).

A synthetic .shp/.dbf pair is written byte-by-byte by the test (ESRI
shapefile spec: 100-byte big-endian header, little-endian polygon
records; dBASE III header + fixed-width records) and the resulting masks
are compared against hand-computed point-in-polygon truth, including a
ring-with-hole case. The real reference asset shapes/indian_borders.shp
is smoke-read; sd_boundary.shp itself is absent from the snapshot
(/root/reference/.MISSING_LARGE_BLOBS) but its .dbf sidecar is read for
region names.
"""

import os
import struct

import numpy as np
import pytest

from s2s_ismr_tpu.viz import regions

REF_SHAPES = "/root/reference/shapes"


# -------------------------------------------------------- synthetic writers
def write_shp(path, polygons):
    """polygons: list of shapes; each shape = list of rings; each ring =
    list of (x, y). Writes a minimal valid polygon shapefile."""
    records = b""
    for recno, rings in enumerate(polygons, start=1):
        pts = np.asarray([p for ring in rings for p in ring], float)
        parts, acc = [], 0
        for ring in rings:
            parts.append(acc)
            acc += len(ring)
        content = struct.pack("<i", 5)                       # polygon
        content += struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(),
                               pts[:, 0].max(), pts[:, 1].max())
        content += struct.pack("<ii", len(rings), len(pts))
        content += struct.pack(f"<{len(parts)}i", *parts)
        content += pts.astype("<f8").tobytes()
        records += struct.pack(">ii", recno, len(content) // 2) + content
    total_words = (100 + len(records)) // 2
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", total_words)
    header += struct.pack("<ii", 1000, 5)
    header += struct.pack("<8d", 0, 0, 100, 100, 0, 0, 0, 0)  # bbox + zm
    assert len(header) == 100
    with open(path, "wb") as f:
        f.write(header + records)


def write_dbf(path, names, field="REGION", width=20):
    header = struct.pack("<BBBBi", 3, 24, 1, 1, len(names))
    header += struct.pack("<hh", 32 + 32 + 1, 1 + width)
    header += b"\x00" * 20
    fld = field.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4
    fld += bytes([width]) + b"\x00" * 15
    assert len(fld) == 32
    body = b""
    for n in names:
        body += b" " + n.encode().ljust(width)[:width]
    with open(path, "wb") as f:
        f.write(header + fld + b"\x0D" + body + b"\x1A")


# ------------------------------------------------------------------- tests
def test_point_in_ring_square():
    ring = np.asarray([(10, 10), (20, 10), (20, 20), (10, 20)], float)
    lon = np.asarray([15, 5, 25, 15, 10.5, 19.5])
    lat = np.asarray([15, 15, 15, 25, 10.5, 19.5])
    got = regions.points_in_ring(lon, lat, ring)
    np.testing.assert_array_equal(got, [True, False, False, False,
                                        True, True])


def test_synthetic_shapefile_roundtrip_and_masks(tmp_path):
    shp = str(tmp_path / "regions.shp")
    # half-offset vertices so no integer cell center sits ON a boundary
    # (on-edge behavior is convention-dependent in any rasterizer)
    square = [(1.5, 1.5), (5.5, 1.5), (5.5, 5.5), (1.5, 5.5), (1.5, 1.5)]
    outer = [(7.5, 7.5), (11.5, 7.5), (11.5, 11.5), (7.5, 11.5), (7.5, 7.5)]
    hole = [(8.5, 8.5), (10.5, 8.5), (10.5, 10.5), (8.5, 10.5), (8.5, 8.5)]
    write_shp(shp, [[square], [outer, hole]])

    shapes = regions.read_shapefile(shp)
    assert len(shapes) == 2
    assert [len(s.rings) for s in shapes] == [1, 2]
    np.testing.assert_allclose(shapes[0].bbox, (1.5, 1.5, 5.5, 5.5))

    lats = np.arange(0.0, 14.0)          # cell centers 0..13
    lons = np.arange(0.0, 14.0)
    masks = regions.rasterize(shapes, lats, lons)
    assert masks.shape == (2, 14, 14)

    glon, glat = np.meshgrid(lons, lats)
    truth_a = (glon > 1.5) & (glon < 5.5) & (glat > 1.5) & (glat < 5.5)
    np.testing.assert_array_equal(masks[0], truth_a)
    # hole: centers 9/10 x 9/10 sit inside the inner ring -> excluded
    truth_b = (glon > 7.5) & (glon < 11.5) & (glat > 7.5) & (glat < 11.5)
    truth_b &= ~((glon > 8.5) & (glon < 10.5) & (glat > 8.5)
                 & (glat < 10.5))
    np.testing.assert_array_equal(masks[1], truth_b)


def test_region_masks_and_dbf_names(tmp_path):
    shp = str(tmp_path / "sd.shp")
    write_shp(shp, [[[(0.5, 0.5), (3.5, 0.5), (3.5, 3.5), (0.5, 3.5),
                      (0.5, 0.5)]],
                    [[(5.5, 5.5), (8.5, 5.5), (8.5, 8.5), (5.5, 8.5),
                      (5.5, 5.5)]]])
    write_dbf(str(tmp_path / "sd.dbf"), ["South Peninsula", "Central"])

    lats = np.arange(0.0, 10.0)
    lons = np.arange(0.0, 10.0)
    masks = regions.region_masks(shp, lats, lons)
    assert masks.shape == (2, 10, 10)
    assert masks[0].sum() == 9           # centers 1..3 x 1..3
    assert masks[1].sum() == 9           # centers 6..8 x 6..8
    assert not (masks[0] & masks[1]).any()

    names = regions.region_names_from_dbf(shp)
    assert names == ["South Peninsula", "Central"]


def test_region_names_absent_dbf(tmp_path):
    shp = str(tmp_path / "lonely.shp")
    write_shp(shp, [[[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]])
    assert regions.region_names_from_dbf(shp) is None


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "not_a.shp"
    p.write_bytes(b"\x00" * 200)
    with pytest.raises(ValueError):
        regions.read_shapefile(str(p))


@pytest.mark.skipif(not os.path.exists(f"{REF_SHAPES}/indian_borders.shp"),
                    reason="reference shapes not mounted")
def test_real_indian_borders_read():
    shapes = regions.read_shapefile(f"{REF_SHAPES}/indian_borders.shp")
    assert shapes
    pts = np.concatenate([r for s in shapes for r in s.rings])
    # India domain sanity: the tune scripts' domains are ~(67-98E, 7-38N)
    assert 60 < pts[:, 0].mean() < 105
    assert 0 < pts[:, 1].mean() < 45


@pytest.mark.skipif(not os.path.exists(f"{REF_SHAPES}/sd_boundary.dbf"),
                    reason="reference shapes not mounted")
def test_real_sd_boundary_dbf_names():
    recs = regions.read_dbf_records(f"{REF_SHAPES}/sd_boundary.dbf")
    assert recs, "sd_boundary.dbf should contain subdivision records"
    assert len(recs[0]) >= 1


def test_region_rpss_table_end_to_end(tmp_path):
    """Bar_plot cells 12-19 equivalent driven through analysis.region_rpss:
    tune-style rpss netcdf + synthetic regions -> per-region records with
    .dbf names."""
    from s2s_ismr_tpu import analysis
    from s2s_ismr_tpu.field import Field
    from s2s_ismr_tpu.io import write_netcdf

    lats = np.arange(0.0, 8.0)
    lons = np.arange(0.0, 8.0)
    rpss = np.zeros((2, 8, 8), np.float32)
    rpss[:, :4, :4] = 0.4                # skillful in the SW block only
    fld = Field(rpss, ("bootstrap", "Y", "X"), {"Y": lats, "X": lons},
                "rpss")
    run = {"period_dir": "Common Period", "model": "ECMWF", "obs": "IMD",
           "arch": "unet", "week": "wk3-4", "lead": "wk3-4"}
    outdir = os.path.join(str(tmp_path), "outputs", run["period_dir"],
                          f"{run['model']}_{run['obs']}")
    write_netcdf(fld, os.path.join(
        outdir, f"{run['arch']}_rpss_test_{run['week']}.nc"))
    # rpss_records also reads the ELR map for its NaN mask
    # (Bar_plot.ipynb cell 3); all-finite here = nothing masked
    write_netcdf(fld, os.path.join(
        outdir, f"ELR_rpss_test_{run['week']}.nc"))

    shp = str(tmp_path / "regions.shp")
    write_shp(shp, [[[(-0.5, -0.5), (3.5, -0.5), (3.5, 3.5), (-0.5, 3.5),
                      (-0.5, -0.5)]],
                    [[(3.5, 3.5), (7.5, 3.5), (7.5, 7.5), (3.5, 7.5),
                      (3.5, 3.5)]]])
    write_dbf(str(tmp_path / "regions.dbf"), ["SW", "NE"])

    table = analysis.region_rpss(str(tmp_path), shp, [run])
    assert set(table.region) == {"SW", "NE"}
    sw = table.values[table.region == "SW"]
    ne = table.values[table.region == "NE"]
    assert len(sw) == 16 and len(ne) == 16
    assert np.allclose(sw, 0.4) and np.allclose(ne, 0.0)
