"""Golden tests: host transform functions vs the reference's, at fixed
parameters (randomness is sampled outside the functions under test)."""

import numpy as np
import pytest
from PIL import Image

from dahpe_tpu.data import transforms as T
from tests.conftest import add_reference_to_path, reference_available

requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _img(h=100, w=100, seed=0):
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    )


@requires_reference
def test_rotate_matches_reference():
    add_reference_to_path()
    import uda.dataset.keypoint_detection as ref_T

    img = _img()
    kp = np.random.default_rng(1).uniform(10, 90, size=(21, 2))
    for angle in (-137.0, 0.0, 33.5, 180.0):
        ref_img, ref_kp = ref_T.rotate(img, angle, kp)
        our_img, our_kp = T.rotate(img, angle, kp)
        np.testing.assert_allclose(our_kp, ref_kp, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(our_img), np.asarray(ref_img))


@requires_reference
def test_crop_and_hflip_match_reference():
    add_reference_to_path()
    import uda.dataset.keypoint_detection as ref_T

    img = _img(80, 120, seed=2)
    kp = np.random.default_rng(3).uniform(0, 80, size=(21, 2))
    ref_img, ref_kp = ref_T.crop(img, 10, 20, 50, 60, kp)
    our_img, our_kp = T.crop(img, 10, 20, 50, 60, kp)
    np.testing.assert_allclose(our_kp, ref_kp)
    np.testing.assert_array_equal(np.asarray(our_img), np.asarray(ref_img))

    ref_img2, ref_kp2 = ref_T.hflip(our_img, our_kp)
    our_img2, our_kp2 = T.hflip(our_img, our_kp)
    np.testing.assert_allclose(our_kp2, ref_kp2)
    np.testing.assert_array_equal(np.asarray(our_img2), np.asarray(ref_img2))


@requires_reference
def test_resize_matches_reference():
    """Reference resize uses torchvision F.resize (absent); compare the
    keypoint/intrinsics algebra against the reference source semantics and
    the image against PIL's own bilinear resize."""
    img = _img(90, 90, seed=4)
    kp = np.random.default_rng(5).uniform(0, 90, size=(21, 2))
    intr = np.asarray([[90.0, 0, 45], [0, 90.0, 45], [0, 0, 1]])
    out_img, out_kp, out_intr = T.resize(img, 60, kp, intr)
    factor = 60 / 90
    np.testing.assert_allclose(out_kp, kp * factor)
    expected_intr = intr.copy()
    expected_intr[0, 0] *= factor
    expected_intr[0, 2] *= factor
    expected_intr[1, 1] *= factor
    expected_intr[1, 2] *= factor
    np.testing.assert_allclose(out_intr, expected_intr)
    np.testing.assert_array_equal(
        np.asarray(out_img), np.asarray(img.resize((60, 60), Image.BILINEAR))
    )


@requires_reference
def test_scale_box_matches_reference():
    add_reference_to_path()
    from uda.dataset.util import scale_box as ref_scale_box

    from dahpe_tpu.core.geometry import scale_box

    rng = np.random.default_rng(6)
    for _ in range(200):
        l, u = rng.uniform(0, 200, 2)
        box = (l, u, l + rng.uniform(1, 100), u + rng.uniform(1, 100))
        w, h = int(rng.integers(150, 400)), int(rng.integers(150, 400))
        scale = float(rng.uniform(1.0, 2.0))
        assert scale_box(box, w, h, scale) == ref_scale_box(box, w, h, scale)
