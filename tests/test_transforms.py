"""Device-side augmentation: warp correctness, box mapping, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from minddet_tpu.data.transforms import (
    centernet_train_transform,
    color_aug,
    eval_affine,
    invert_affine,
    make_affine,
    normalize,
    sample_train_affine,
    transform_boxes,
    warp_images,
)


def test_identity_affine_warp():
    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    # identity: center at (W-1)/2, scale = W, out = in size
    aff = make_affine(
        jnp.array([[7.5, 7.5]]), jnp.array([16.0]), (16, 16)
    )
    out = np.asarray(warp_images(jnp.asarray(img), aff, (16, 16)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_downscale_warp_averages():
    img = jnp.ones((1, 32, 32, 1))
    aff = eval_affine(jnp.array([[32, 32]]), (16, 16))
    out = np.asarray(warp_images(img, aff, (16, 16)))
    np.testing.assert_allclose(out, 1.0, atol=1e-4)  # constant image stays constant


def test_affine_invert_roundtrip():
    aff = make_affine(jnp.array([[100.0, 60.0]]), jnp.array([250.0]), (128, 128))
    inv = invert_affine(aff)
    # A @ [p;1] then A^-1 @ [q;1] = p
    p = jnp.array([5.0, 10.0])
    q = aff[0, :, :2] @ p + aff[0, :, 2]
    p2 = inv[0, :, :2] @ q + inv[0, :, 2]
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-3)


def test_box_transform_matches_point_mapping():
    aff = make_affine(jnp.array([[50.0, 40.0]]), jnp.array([100.0]), (64, 64))
    boxes = jnp.array([[[20.0, 10.0, 80.0, 70.0]]])
    out = transform_boxes(boxes, aff, (64, 64), clip=False)
    fwd = invert_affine(aff)
    c1 = fwd[0, :, :2] @ jnp.array([20.0, 10.0]) + fwd[0, :, 2]
    c2 = fwd[0, :, :2] @ jnp.array([80.0, 70.0]) + fwd[0, :, 2]
    np.testing.assert_allclose(
        np.asarray(out[0, 0]),
        np.asarray(jnp.concatenate([c1, c2])),
        atol=1e-3,
    )


def test_flip_affine_mirrors():
    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, :, 0, 0] = 1.0  # left column lit
    aff = make_affine(
        jnp.array([[3.5, 3.5]]), jnp.array([8.0]), (8, 8), flip=jnp.array([True])
    )
    out = np.asarray(warp_images(jnp.asarray(img), aff, (8, 8)))
    assert out[0, 0, 7, 0] > 0.9 and out[0, 0, 0, 0] < 0.1


def test_full_train_transform_shapes_and_determinism():
    rng = np.random.RandomState(1)
    images = (rng.rand(2, 64, 64, 3) * 255).astype(np.float32)
    hw = jnp.array([[64, 64], [48, 60]])
    boxes = jnp.asarray(rng.uniform(5, 40, (2, 4, 4)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    out1 = centernet_train_transform(key, jnp.asarray(images), hw, boxes, (32, 32))
    out2 = centernet_train_transform(key, jnp.asarray(images), hw, boxes, (32, 32))
    assert out1["image"].shape == (2, 32, 32, 3)
    assert out1["boxes"].shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(out1["image"]), np.asarray(out2["image"]))
    out3 = centernet_train_transform(jax.random.PRNGKey(1), jnp.asarray(images), hw, boxes, (32, 32))
    assert np.abs(np.asarray(out3["image"]) - np.asarray(out1["image"])).max() > 1e-3


def test_color_aug_preserves_shape_and_range():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
    out = color_aug(jax.random.PRNGKey(0), img)
    assert out.shape == img.shape
    assert float(jnp.mean(jnp.abs(out - img))) > 1e-4  # actually does something


def test_normalize():
    img = jnp.zeros((1, 2, 2, 3))
    out = np.asarray(normalize(img))
    assert out.min() < 0  # zero pixels map below mean


def test_mosaic_composes_four_images():
    import jax

    from minddet_tpu.data.transforms import mosaic

    b, h, w = 4, 16, 16
    images = np.zeros((b, h, w, 3), np.float32)
    for i in range(b):
        images[i] = i + 1.0  # constant-valued images 1..4
    hw = jnp.asarray(np.tile([[h, w]], (b, 1)))
    boxes = jnp.asarray(np.tile([[[2.0, 2.0, 10.0, 10.0]]], (b, 1, 1)))
    mask = jnp.ones((b, 1), bool)
    out = mosaic(jax.random.PRNGKey(0), jnp.asarray(images), hw, boxes, mask, (32, 32))
    img = np.asarray(out["image"])
    # sample 0's mosaic must contain values from all four source images
    vals = set(np.unique(np.round(img[0]).astype(int))) - {0}
    assert vals == {1, 2, 3, 4}
    assert out["boxes"].shape == (b, 4, 4)
    assert out["mask"].shape == (b, 4)


def test_mixup_blends():
    import jax

    from minddet_tpu.data.transforms import mixup

    images = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
    boxes = jnp.zeros((2, 2, 4))
    mask = jnp.ones((2, 2), bool)
    out = mixup(jax.random.PRNGKey(0), images, boxes, mask)
    m = float(jnp.mean(out["image"][0]))
    assert 0.1 < m < 0.9  # genuinely blended
    assert out["boxes"].shape == (2, 4, 4)
