"""i2i image-loading path tests."""

import numpy as np

from gloc3d_tpu.data.images import image_paths_for_scans, load_bev_images, pad_and_crop


def test_pad_and_crop_semantics():
    # smaller image centered with 255 fill
    img = np.zeros((4, 6), np.uint8)
    out = pad_and_crop(img, 8)
    assert out.shape == (8, 8)
    assert out[0, 0] == 255
    assert (out[2:6, 1:7] == 0).all()
    # larger image center-cropped
    big = np.arange(100, dtype=np.uint8).reshape(10, 10)
    out = pad_and_crop(big, 4)
    np.testing.assert_array_equal(out, big[3:7, 3:7])


def test_load_bev_images(tmp_path):
    for i in range(3):
        img = np.full((100, 120), 255, np.uint8)
        img[40 + i, 50] = 0
        np.savez(str(tmp_path / f"{i:06d}.npz"), image=img,
                 origin_xy=np.array([i * 1.0, -1.0]), resolution=0.2)
    paths = [str(tmp_path / f"{i:06d}.npz") for i in range(3)]
    imgs, origins = load_bev_images(paths, size=128)
    assert imgs.shape == (3, 128, 128, 3)
    assert imgs.dtype == np.float32
    assert imgs.max() == 1.0 and imgs.min() == 0.0
    # origins are propagated through the center pad/crop so every pixel keeps
    # its metric position: the marked pixel (row 40+i, col 50) must map to the
    # same (x, y) before and after padding (rows=y, cols=x, origin=pixel(0,0)).
    res = 0.2
    for i in range(3):
        rows, cols = np.nonzero(imgs[i, :, :, 0] == 0.0)
        assert len(rows) == 1
        x = origins[i, 0] + cols[0] * res
        y = origins[i, 1] + rows[0] * res
        np.testing.assert_allclose(x, i * 1.0 + 50 * res, atol=1e-5)
        np.testing.assert_allclose(y, -1.0 + (40 + i) * res, atol=1e-5)


def test_image_paths_for_scans():
    paths = image_paths_for_scans(
        ["/data/seq/velodyne/000042.bin"], "/data/seq/prob_img"
    )
    assert paths == ["/data/seq/prob_img/000042.npz"]


def test_load_reference_jpeg_prob_img(tmp_path):
    """The reference's own prob_img JPEG artifacts (save_probability_img
    output, read at i2i_util.py:156) ingest unmodified: grayscale decode,
    255-fill pad/crop, image-centered metric origin (submap_3d.cpp:265-276
    centers the projection), and extension auto-probe from scan stems."""
    from PIL import Image

    img = np.full((700, 700), 255, np.uint8)
    img[350, 350] = 0  # center pixel marked occupied
    Image.fromarray(img, mode="L").save(str(tmp_path / "000042.jpg"))

    paths = image_paths_for_scans(
        ["/data/seq/velodyne/000042.bin"], str(tmp_path))
    assert paths == [str(tmp_path / "000042.jpg")]

    imgs, origins = load_bev_images(paths, size=768)
    assert imgs.shape == (1, 768, 768, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    rows, cols = np.nonzero(imgs[0, :, :, 0] < 0.1)
    assert len(rows) == 1
    # marked center pixel must land at metric (0, 0): origin + idx*res = 0
    res = 0.2
    np.testing.assert_allclose(origins[0, 0] + cols[0] * res, 0.0, atol=0.21)
    np.testing.assert_allclose(origins[0, 1] + rows[0] * res, 0.0, atol=0.21)
