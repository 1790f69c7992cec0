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


def test_opacity_regularizer_pushes_extremes():
    """w_opacity adds a binary-entropy term on event-ray weight sums that
    is maximal at ws=0.5 and ~zero at 0/1 (mist-gauge countermeasure)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.train.step import StepStatics, event_loss_fn
    from enerf_tpu.render.occupancy import GRID_SIZE

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10, encoding="blockgrid")
    params = init_field_params(jax.random.PRNGKey(0), static)
    g = np.arange(GRID_SIZE)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * np.stack([xs, ys, zs], -1) / (GRID_SIZE - 1) - 1.0
    occ = jnp.asarray((np.linalg.norm(c, axis=-1) < 0.5).reshape(1, -1))

    n = 32
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                             minval=-0.3, maxval=0.3)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"rays_evs_o1": o, "rays_evs_d1": d,
             "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
             "pols": jnp.ones((n,), jnp.float32)}
    kw = dict(field_static=static, num_steps=16, upsample_steps=0,
              min_near=0.2, density_scale=1.0, C_thres=0.2, event_only=True,
              use_luma=False, linlog=True, weight_loss_rgb=1.0,
              negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
              use_march=True, march_samples=8, max_steps=128,
              compact_frac=0.5)
    l0, a0 = event_loss_fn(params, StepStatics(**kw), batch,
                           jax.random.PRNGKey(2), occ)
    l1, a1 = event_loss_fn(params, StepStatics(**kw, w_opacity=0.1), batch,
                           jax.random.PRNGKey(2), occ)
    assert "loss_opacity" not in a0
    assert "loss_opacity" in a1 and float(a1["loss_opacity"]) >= 0.0
    assert float(l1) >= float(l0)
    # gradient flows through the regularizer into the table
    gr = jax.grad(lambda p: event_loss_fn(
        p, StepStatics(**kw, w_opacity=0.1), batch,
        jax.random.PRNGKey(2), occ)[0])(params)
    assert float(jnp.abs(gr["hash_table"]).max()) > 0.0


def test_distortion_loss_matches_quadratic_oracle():
    """distortion_loss's O(S) cumulative form equals the naive O(S^2)
    mip-NeRF 360 eq. 15 double sum."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enerf_tpu.train.step import distortion_loss

    rng = np.random.RandomState(3)
    N, S = 7, 12
    ts = np.sort(rng.uniform(0.1, 2.0, (N, S)), axis=-1)
    dts = np.abs(rng.uniform(0.01, 0.05, (N, S)))
    w = rng.uniform(0, 1, (N, S))
    w[:, -3:] = 0.0  # invalid slots carry zero weight
    got = float(distortion_loss(jnp.asarray(w), jnp.asarray(ts),
                                jnp.asarray(dts)))
    cross = np.einsum("ni,nj,nij->n", w, w,
                      np.abs(ts[:, :, None] - ts[:, None, :]))
    ref = float(np.mean(cross + (w * w * dts).sum(-1) / 3.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_distortion_regularizer_wired():
    """w_distortion adds the term on the march path (mist countermeasure);
    gradient flows; eval/no-flag paths don't materialize weights."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.train.step import StepStatics, event_loss_fn
    from enerf_tpu.render.occupancy import ball_bitfield

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10, encoding="blockgrid")
    params = init_field_params(jax.random.PRNGKey(0), static)
    occ = ball_bitfield(radius=0.5)

    n = 32
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    tgt = jax.random.uniform(jax.random.PRNGKey(1), (n, 3),
                             minval=-0.3, maxval=0.3)
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"rays_evs_o1": o, "rays_evs_d1": d,
             "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
             "pols": jnp.ones((n,), jnp.float32)}
    kw = dict(field_static=static, num_steps=16, upsample_steps=0,
              min_near=0.2, density_scale=1.0, C_thres=0.2, event_only=True,
              use_luma=False, linlog=True, weight_loss_rgb=1.0,
              negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
              use_march=True, march_samples=8, max_steps=128,
              compact_frac=0.5)
    for share in (False, True):
        l0, a0 = event_loss_fn(
            params, StepStatics(**kw, share_march=share), batch,
            jax.random.PRNGKey(2), occ)
        l1, a1 = event_loss_fn(
            params, StepStatics(**kw, share_march=share, w_distortion=0.01),
            batch, jax.random.PRNGKey(2), occ)
        assert "loss_distortion" not in a0
        assert "loss_distortion" in a1 and float(a1["loss_distortion"]) >= 0
        gr = jax.grad(lambda p: event_loss_fn(
            p, StepStatics(**kw, share_march=share, w_distortion=0.01),
            batch, jax.random.PRNGKey(2), occ)[0])(params)
        assert float(jnp.abs(gr["hash_table"]).max()) > 0.0
