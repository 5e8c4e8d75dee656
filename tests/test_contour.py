"""Contour-blob virtual clouds: TPU connected components vs a scipy golden,
and the area-filter/erode semantics of get_scan_from_contours."""

import numpy as np
import scipy.ndimage as ndi

from gloc3d_tpu.ops.contour import (
    component_areas, connected_components, contour_virtual_cloud, erode3x3,
)

EIGHT = np.ones((3, 3), int)


def _random_blobs(seed=0, s=96, p=0.55):
    rng = np.random.RandomState(seed)
    img = (rng.rand(s, s) < p).astype(np.float32)
    # smooth into blobby structure
    img = (ndi.uniform_filter(img, 5) > 0.55).astype(np.float32)
    return img


def test_connected_components_matches_scipy():
    occ = _random_blobs()
    labels = np.asarray(connected_components(occ))
    ref, n = ndi.label(occ, structure=EIGHT)
    # same partition: for each scipy component, exactly one device label
    assert (labels[occ < 0.5] == occ.size).all()
    for i in range(1, n + 1):
        got = np.unique(labels[ref == i])
        assert len(got) == 1, f"component {i} split into {got}"
    # and distinct components have distinct labels
    firsts = [labels[ref == i][0] for i in range(1, n + 1)]
    assert len(set(firsts)) == n


def test_connected_components_snake():
    """A long serpentine blob exercises the pointer-jumping convergence."""
    s = 64
    occ = np.zeros((s, s), np.float32)
    for r in range(0, s, 4):
        occ[r, :] = 1.0
        if (r // 4) % 2 == 0:
            occ[r:r + 5, s - 1] = 1.0
        else:
            occ[r:r + 5, 0] = 1.0
    labels = np.asarray(connected_components(occ))
    fg = labels[occ > 0.5]
    assert (fg == fg[0]).all(), "snake must be one component"


def test_erode_matches_scipy():
    occ = _random_blobs(seed=1)
    got = np.asarray(erode3x3(occ))
    want = ndi.binary_erosion(occ > 0.5, structure=EIGHT).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_component_areas():
    occ = np.zeros((16, 16), np.float32)
    occ[2:6, 2:6] = 1.0   # area 16
    occ[10:12, 10:13] = 1.0  # area 6
    labels = np.asarray(connected_components(occ))
    areas = np.asarray(component_areas(labels))
    fg = sorted(areas[np.unique(labels[occ > 0.5])])
    assert fg == [6, 16]


def test_contour_virtual_cloud_area_filter():
    """Keeps solid mid-size blobs; drops specks and giant regions
    (area ∈ (min_area, S²/4), get_scan_from_contours semantics)."""
    s = 128
    img = np.ones((s, s), np.float32)  # free = 1.0
    img[8:40, 8:40] = 0.0             # solid 32x32 blob → kept (area 1024)
    img[60:63, 60:63] = 0.0           # 3x3 speck → eroded away / < min_area
    img[:, 90:]  = 0.0                # giant region 128x38 = 4864 > S²/4 → dropped
    res = 0.2
    origin = np.array([-12.8, -12.8], np.float32)
    pts, valid = contour_virtual_cloud(
        img, origin, res, budget=4096, min_area=100,
    )
    pts, valid = np.asarray(pts), np.asarray(valid)
    kept = pts[valid > 0.5]
    assert len(kept) > 0
    # all kept points lie inside the (eroded) 32x32 blob
    cols = (kept[:, 0] - origin[0]) / res
    rows = (kept[:, 1] - origin[1]) / res
    assert (cols >= 8).all() and (cols < 40).all()
    assert (rows >= 8).all() and (rows < 40).all()
    # eroded blob is 30x30
    assert abs(len(kept) - 30 * 30) <= 60
