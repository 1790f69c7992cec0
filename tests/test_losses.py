"""Unit tests for the event loss math (reference utils.py:509-567)."""

import numpy as np
import jax.numpy as jnp

from enerf_tpu.train import losses


def test_rgb_to_luma_coefficients():
    rgb = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    l_esim = np.asarray(losses.rgb_to_luma(rgb, esim=True))[:, 0]
    np.testing.assert_allclose(l_esim, [0.299, 0.587, 0.114], atol=1e-7)
    l_709 = np.asarray(losses.rgb_to_luma(rgb, esim=False))[:, 0]
    np.testing.assert_allclose(l_709, [0.2126, 0.7152, 0.0722], atol=1e-7)


def test_lin_log_continuity_and_values():
    # continuous at the threshold; log above; linear below
    t = 20.0
    below = float(losses.lin_log(jnp.asarray(t - 1e-4)))
    above = float(losses.lin_log(jnp.asarray(t + 1e-4)))
    assert abs(below - above) < 1e-3
    np.testing.assert_allclose(float(losses.lin_log(jnp.asarray(100.0))), np.log(100.0), rtol=1e-6)
    np.testing.assert_allclose(float(losses.lin_log(jnp.asarray(10.0))), np.log(20.0) / 20.0 * 10.0, rtol=1e-6)


def test_event_loss_C_thres():
    # perfect prediction -> zero loss
    pol = jnp.asarray([[1.0, -1.0, 1.0]])[..., None]
    delta = pol * 0.2
    assert float(losses.event_loss(delta, pol, C_thres=0.2)) < 1e-12
    # off by d -> mse d^2
    loss = float(losses.event_loss(delta + 0.1, pol, C_thres=0.2))
    np.testing.assert_allclose(loss, 0.01, rtol=1e-5)


def test_event_loss_normalized():
    # C_thres == -1: direction-only supervision; scale-invariant in delta
    pol = jnp.asarray([[1.0, -1.0, 1.0, 1.0]])[..., None]
    delta = pol * 0.37
    l1 = float(losses.event_loss(delta, pol, C_thres=-1))
    l2 = float(losses.event_loss(delta * 10.0, pol, C_thres=-1))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    assert l1 < 1e-9  # perfectly aligned directions
    # weights: x20 event-only, x400 combined (utils.py:523-525)
    wrong = -delta
    lo = float(losses.event_loss(wrong, pol, C_thres=-1, event_only=True))
    lc = float(losses.event_loss(wrong, pol, C_thres=-1, event_only=False))
    np.testing.assert_allclose(lc / lo, 20.0, rtol=1e-5)


def test_no_event_loss_hinge():
    d = jnp.asarray([[0.1, -0.3, 0.05]])[..., None]
    # C=0.2: only |−0.3| exceeds -> mean(relu(|d|-0.2)) = 0.1/3
    loss = float(losses.no_event_loss(d, C_thres=0.2))
    np.testing.assert_allclose(loss, 0.1 / 3, rtol=1e-5)
    # C_thres <= 0 falls back to 0.25 (utils.py:565)
    loss2 = float(losses.no_event_loss(d, C_thres=-1))
    np.testing.assert_allclose(loss2, 0.05 / 3, rtol=1e-5)


def test_implicit_C_estimation():
    pol = jnp.asarray([1.0, 1.0, -1.0, -1.0])[:, None]
    delta = jnp.asarray([0.2, 0.3, -0.2, -0.4])[:, None]
    est = losses.estimate_implicit_C(pol, delta)
    np.testing.assert_allclose(float(est["median_on"]), 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(est["median_off"]), 0.3, rtol=1e-5)


def test_log_intensity_paths():
    img = jnp.asarray([[0.5, 0.5, 0.5]])
    # luma path: 0.5 * 255 = 127.5 -> log
    v = float(losses.log_intensity(img, use_luma=True, linlog=True)[0, 0])
    np.testing.assert_allclose(v, np.log(127.5), rtol=1e-5)
    # rgb path keeps channels
    v3 = losses.log_intensity(img, use_luma=False, linlog=True)
    assert v3.shape == (1, 3)
    # plain log path clamps at log_thres
    v0 = float(losses.log_intensity(jnp.asarray([[0.0]]), use_luma=False,
                                    linlog=False, log_thres=1e-5)[0, 0])
    np.testing.assert_allclose(v0, np.log(1e-5), rtol=1e-5)
