"""Geodesy converters (`python/geo_tran/*`, `nav/geo_tran.h`), vertical
intrinsic calibration (`cfilter.hpp:250-292`), and the range-image / 2D-map
rasterizers (`cfilter.hpp:2714-2795`)."""

import numpy as np
import jax.numpy as jnp

from mulls_tpu.core import geo
from mulls_tpu.ops.motion import vertical_intrinsic_calibration
from mulls_tpu.mapping.assembly import occupancy_2d_map, range_image


def test_blh2xyz_reference_vectors():
    # the reference's own doctest vectors (python/geo_tran/blh2xyz.py)
    x, y, z = geo.blh2xyz(39.608611, 115.892456, 108.0420)
    assert (round(float(x)), round(float(y)), round(float(z))) == \
        (-2148748, 4426656, 4044670)
    x, y, z = geo.blh2xyz(4.640045, -74.080950, 2563.1791)
    assert (round(float(x)), round(float(y)), round(float(z))) == \
        (1744394, -6116025, 512728)


def test_xyz2blh_roundtrip():
    x, y, z = geo.blh2xyz(39.608611, 115.892456, 108.0420)
    lat, lon, h = geo.xyz2blh(x, y, z)
    assert abs(float(lat) - 39.608611) < 1e-9
    assert abs(float(lon) - 115.892456) < 1e-9
    assert abs(float(h) - 108.0420) < 1e-5


def test_xyz2neu_reference_vector():
    # python/geo_tran/xyz2neu.py doctest (BJFS IGS site)
    n, e, u = geo.xyz2neu(-2148747.998, 4426652.444, 4044675.151,
                          -2148745.727, 4426649.545, 4044668.469)
    assert (round(float(n), 2), round(float(e), 2), round(float(u), 2)) == \
        (-2.85, -0.78, -7.03)


def test_utm_roundtrip_and_known_point():
    # Paris: published UTM 31N ~ (452482.5 E, 5411717 N)
    E, N, zone = geo.utm_forward(48.8566, 2.3522)
    assert zone == 31
    assert abs(float(E) - 452482.5) < 2.0
    assert abs(float(N) - 5411717.2) < 2.0
    for lat, lon in [(31.23, 121.47), (-33.86, 151.21), (70.1, -150.2)]:
        E, N, zone = geo.utm_forward(lat, lon)
        la, lo = geo.utm_inverse(E, N, zone, south=lat < 0)
        assert abs(float(la) - lat) < 1e-9
        assert abs(float(lo) - lon) < 1e-9


def test_utm_central_meridian_scale():
    # on the central meridian: easting == false easting exactly
    E, N, _ = geo.utm_forward(45.0, 123.0, zone=51)
    assert abs(float(E) - 500000.0) < 1e-6
    assert float(N) > 0


def test_gnss_to_pose_rotation():
    T = geo.gnss_to_pose(31.23, 121.47, 15.0, 0.0, 0.0, 90.0)
    # yaw-90: x axis maps to y
    assert np.allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    assert abs(T[2, 3] - 15.0) < 1e-12
    R = T[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_vertical_intrinsic_calibration():
    xyz = jnp.asarray([[10.0, 0.0, 0.0], [0.0, 5.0, 5.0]], jnp.float32)
    out = np.asarray(vertical_intrinsic_calibration(xyz, 1.0))
    # range preserved, elevation shifted by exactly 1 degree
    d0 = np.linalg.norm(np.asarray(xyz), axis=-1)
    d1 = np.linalg.norm(out, axis=-1)
    assert np.allclose(d0, d1, rtol=1e-5)
    v0 = np.degrees(np.arcsin(np.asarray(xyz)[:, 2] / d0))
    v1 = np.degrees(np.arcsin(out[:, 2] / d1))
    assert np.allclose(v1 - v0, 1.0, atol=1e-4)
    # azimuth unchanged
    assert np.allclose(np.arctan2(out[:, 1], out[:, 0]),
                       np.arctan2(np.asarray(xyz)[:, 1],
                                  np.asarray(xyz)[:, 0]), atol=1e-6)
    # sentinel >= 180 inverts z
    inv = np.asarray(vertical_intrinsic_calibration(xyz, 180.0))
    assert np.allclose(inv[:, 2], -np.asarray(xyz)[:, 2])
    # zero is a no-op (and stays a traceable identity)
    same = np.asarray(vertical_intrinsic_calibration(xyz, 0.0))
    assert np.array_equal(same, np.asarray(xyz))


def test_range_image_mapping():
    # a point straight ahead (+x) at half max range, on the horizon
    pts = np.array([[35.0, 0.0, 0.0]])
    img = range_image(pts, width=900, height=64, max_distance=70.0)
    assert img.shape == (64, 900)
    r, c = np.argwhere(img > 0)[0]
    assert c == 450  # +x maps to the image centre column
    assert img[r, c] == 127
    # elevation ordering: higher point -> smaller row index (image top)
    hi = range_image(np.array([[35.0, 0.0, 1.5]]))
    lo = range_image(np.array([[35.0, 0.0, -10.0]]))
    assert np.argwhere(hi > 0)[0][0] < np.argwhere(lo > 0)[0][0]


def test_occupancy_2d_map():
    rng = np.random.default_rng(0)
    wall = np.stack([np.full(500, 5.0), rng.uniform(-3, 3, 500),
                     rng.uniform(0.0, 2.0, 500)], -1)
    img = occupancy_2d_map(wall, m2pix=2.0, map_width=64, map_height=64,
                           min_points_in_pix=1, max_points_in_pix=5)
    assert img.shape == (64, 64)
    # wall pixels darker than empty background
    assert img.min() < 128 and img.max() == 255
    # out-of-slab points ignored
    empty = occupancy_2d_map(wall + [0, 0, 100.0], m2pix=2.0,
                             map_width=64, map_height=64)
    assert empty.min() == 255


def test_html_viewer_export_roundtrip(tmp_path, rng):
    """The WebGL viewer (headless MapViewer replacement) embeds a
    decodable payload: class-sorted points, consistent draw-range offsets,
    trajectory + typed pose-graph edges."""
    import base64
    import json
    import re
    from mulls_tpu.viz import export_html_viewer
    from mulls_tpu.viz.html_viewer import CLASS_NAMES

    n = 5000
    xyz = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    cls = rng.integers(0, 7, n).astype(np.uint8)
    inten = rng.integers(0, 256, n).astype(np.uint8)
    traj = np.cumsum(rng.normal(size=(40, 3)), 0).astype(np.float32)
    edges = [(0, 10, 1), (5, 35, 2)]
    path = str(tmp_path / "v.html")
    n_out = export_html_viewer(path, xyz, cls, inten, traj, edges,
                               title="t")
    assert n_out == n
    html = open(path).read()
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    assert m, "payload not found"
    D = json.loads(m.group(1))
    assert D["n"] == n and D["classNames"] == list(CLASS_NAMES)

    got_xyz = np.frombuffer(base64.b64decode(D["xyz"]),
                            np.float32).reshape(-1, 3)
    got_cls = np.frombuffer(base64.b64decode(D["cls"]), np.uint8)
    got_tr = np.frombuffer(base64.b64decode(D["traj"]),
                           np.float32).reshape(-1, 3)
    # points are the same set, sorted by class
    assert np.all(np.diff(got_cls.astype(int)) >= 0)
    order = np.argsort(cls, kind="stable")
    np.testing.assert_array_equal(got_xyz, xyz[order])
    # offsets are the class draw ranges
    off = D["offsets"]
    for k in range(7):
        assert off[k + 1] - off[k] == int((cls == k).sum())
        assert np.all(got_cls[off[k]:off[k + 1]] == k)
    np.testing.assert_array_equal(got_tr, traj)
    assert D["edges"] == [[0, 10, 1], [5, 35, 2]]
    assert D["radius"] > 0
    # the html is self-contained: no external fetches
    assert "http://" not in html and "https://" not in html
    assert html.count("<script>") == 1 and html.count("</script>") == 1
