import numpy as np
import jax
import jax.numpy as jnp

from lsfa_tpu.ops.deform_conv import deform_conv


def test_zero_offsets_equal_standard_conv():
    rng = np.random.default_rng(0)
    h, w, cin, cout = 10, 12, 8, 16
    x = rng.normal(size=(h, w, cin)).astype(np.float32)
    wgt = rng.normal(0, 0.1, size=(3, 3, cin, cout)).astype(np.float32)
    off = np.zeros((h, w, 2 * 9 * 2), np.float32)  # 2 groups

    got = deform_conv(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
                      kernel=3, dilate=1, groups=2)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(wgt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_zero_offsets_equal_dilated_conv():
    rng = np.random.default_rng(1)
    h, w, cin, cout = 9, 9, 4, 6
    x = rng.normal(size=(h, w, cin)).astype(np.float32)
    wgt = rng.normal(0, 0.1, size=(3, 3, cin, cout)).astype(np.float32)
    off = np.zeros((h, w, 1 * 9 * 2), np.float32)
    got = deform_conv(jnp.asarray(x), jnp.asarray(off), jnp.asarray(wgt),
                      kernel=3, dilate=2, groups=1)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x)[None], jnp.asarray(wgt), (1, 1), "SAME",
        rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    # a +1 x-offset on every tap equals convolving an x-shifted input
    rng = np.random.default_rng(2)
    h, w, cin, cout = 8, 8, 4, 3
    x = rng.normal(size=(h, w, cin)).astype(np.float32)
    wgt = rng.normal(0, 0.1, size=(3, 3, cin, cout)).astype(np.float32)
    off = np.zeros((h, w, 9, 2), np.float32)
    off[..., 1] = 1.0  # dx = +1
    got = deform_conv(jnp.asarray(x), jnp.asarray(off.reshape(h, w, -1)),
                      jnp.asarray(wgt), kernel=3, dilate=1, groups=1)
    x_shift = np.zeros_like(x)
    x_shift[:, :-1] = x[:, 1:]
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift)[None], jnp.asarray(wgt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    # interior only (border differs: zero-pad vs shifted zero column)
    np.testing.assert_allclose(np.asarray(got)[1:-1, 1:-2],
                               np.asarray(want)[1:-1, 1:-2], rtol=1e-4, atol=1e-4)


def test_gradients_flow():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 6, 4)).astype(np.float32))
    wgt = jnp.asarray(rng.normal(0, 0.1, size=(3, 3, 4, 5)).astype(np.float32))
    off = jnp.asarray(rng.normal(0, 0.5, size=(6, 6, 18)).astype(np.float32))
    g = jax.grad(lambda x, o, w: jnp.sum(deform_conv(x, o, w) ** 2),
                 argnums=(0, 1, 2))(x, off, wgt)
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
        assert np.abs(np.asarray(gi)).sum() > 0
