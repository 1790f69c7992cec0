"""Golden-value tests against the actual PyTorch reference.

The arrays in tests/golden/*.npz were produced by running the reference's
own code (nerf/renderer.py run(), encoding.py, activation.py,
utils/event_utils.py, nerf/utils.py loss + ray + metric helpers,
utils/pose_utils.py slerp) on CPU via scripts/make_goldens.py.  These tests
fail if either implementation drifts — the cross-implementation oracle the
reference itself lacks (SURVEY.md section 4(b)).

The hash-index cases at the bottom validate our vectorized uint32 index
math against a direct scalar transliteration of gridencoder.cu:34-71
(fast_hash + get_grid_index), written independently of ops/hashgrid.py.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing (run scripts/make_goldens.py)")
    return np.load(path)


# --------------------------------------------------------------------- ops

def test_freq_encoder_golden():
    from enerf_tpu.ops.freq import freq_encode

    g = _load("freq_encoder.npz")
    x = jnp.asarray(g["x"])
    w = jnp.asarray(g["w"])
    y = freq_encode(x, multires=int(g["N_freqs"]))
    np.testing.assert_allclose(np.asarray(y), g["y"], atol=1e-5)

    dx = jax.grad(lambda x: jnp.sum(freq_encode(x, multires=6) * w))(x)
    np.testing.assert_allclose(np.asarray(dx), g["dx"], atol=1e-4)


def test_trunc_exp_golden():
    from enerf_tpu.ops.trunc_exp import trunc_exp

    g = _load("trunc_exp.npz")
    x = jnp.asarray(g["x"])
    y = trunc_exp(x)
    np.testing.assert_allclose(np.asarray(y), g["y"], rtol=1e-6)
    dx = jax.grad(lambda x: jnp.sum(trunc_exp(x)))(x)
    np.testing.assert_allclose(np.asarray(dx), g["dx"], rtol=1e-5)


def test_luma_linlog_golden():
    from enerf_tpu.train.losses import rgb_to_luma, lin_log

    g = _load("event_utils.npz")
    rgb = jnp.asarray(g["rgb"])
    np.testing.assert_allclose(
        np.asarray(rgb_to_luma(rgb, esim=True)), g["luma_esim"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rgb_to_luma(rgb, esim=False)), g["luma_709"], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(lin_log(jnp.asarray(g["vals"]))), g["linlog"], atol=1e-6)


def test_normal_equations_golden():
    from enerf_tpu.train.metrics import solve_normal_equations

    g = _load("normal_eq.npz")
    a, b = solve_normal_equations(g["pred"], g["gt"])
    np.testing.assert_allclose(a, float(g["a"]), rtol=1e-6)
    np.testing.assert_allclose(b, float(g["b"]), rtol=1e-6)


# --------------------------------------------------------------------- rays

def test_get_rays_golden():
    from enerf_tpu.data.rays import get_rays_full

    g = _load("rays.npz")
    ro, rd = get_rays_full(
        jnp.asarray(g["pose"]), tuple(np.asarray(g["intrinsics"])),
        int(g["H"]), int(g["W"]),
    )
    np.testing.assert_allclose(np.asarray(ro), g["rays_o"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), g["rays_d"][0], atol=1e-5)


def test_get_event_rays_golden():
    from enerf_tpu.data.rays import get_event_rays

    g = _load("rays.npz")
    out = get_event_rays(
        jnp.asarray(g["xs"]), jnp.asarray(g["ys"]),
        jnp.asarray(g["p1"], jnp.float32), jnp.asarray(g["p2"], jnp.float32),
        tuple(np.asarray(g["intrinsics"])),
    )
    np.testing.assert_allclose(np.asarray(out["rays_evs_o1"]), g["evs_o1"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rays_evs_d1"]), g["evs_d1"][0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["rays_evs_o2"]), g["evs_o2"][0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["rays_evs_d2"]), g["evs_d2"][0], atol=1e-5)


# ----------------------------------------------------------------- renderer

class _AnalyticStatic:
    """Minimal static carrier for the analytic-field renders."""

    def __init__(self, bound):
        self.bound = bound
        self.bg_radius = -1.0

    def __hash__(self):
        return hash(("analytic", self.bound))

    def __eq__(self, other):
        return type(other) is type(self) and self.bound == other.bound


def _analytic_fns(wg, wd):
    def density_fn(params, static, x):
        r2 = jnp.sum(x ** 2, -1)
        sigma = params["s"] * 3.0 * jnp.exp(-4.0 * r2) * (
            1.5 + jnp.sin(5.0 * x[..., 0]))
        return sigma, x  # geo_feat carries positions to the color fn

    def color_fn(params, static, d, geo_feat):
        return jax.nn.sigmoid(geo_feat @ wg + d @ wd)

    return density_fn, color_fn


@pytest.mark.parametrize("tag", ["noups", "ups"])
def test_run_renderer_golden(tag):
    """End-to-end image/depth/param-grad parity with the reference's pure
    torch run() (renderer.py:150-278) on an identical analytic field."""
    from enerf_tpu.render.renderer import render_rays

    g = _load(f"run_renderer_{tag}.npz")
    fns = _analytic_fns(jnp.asarray(g["wg"]), jnp.asarray(g["wd"]))
    static = _AnalyticStatic(float(g["bound"]))

    def render(s):
        return render_rays(
            {"s": s}, static,
            jnp.asarray(g["rays_o"]), jnp.asarray(g["rays_d"]),
            num_steps=int(g["num_steps"]), upsample_steps=int(g["upsample_steps"]),
            bg_color=float(g["bg"]), perturb=False, train=False,
            min_near=float(g["min_near"]), density_scale=float(g["density_scale"]),
            field_fns=fns,
        )

    out = render(jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(out["image"]), g["image"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"]), g["depth"], atol=2e-5)

    grad_s = jax.grad(
        lambda s: jnp.sum(render(s)["image"]) + jnp.sum(render(s)["depth"])
    )(jnp.float32(1.0))
    np.testing.assert_allclose(float(grad_s), float(g["grad_s"]), rtol=2e-4)


# --------------------------------------------------------------- event loss

def test_event_loss_golden():
    """Full train_step_events loss math (utils.py:482-573) from preset
    rendered images, all four configurations."""
    from enerf_tpu.train import losses

    g = _load("event_loss.npz")
    img1 = jnp.asarray(g["img1"])  # [1, NE, 1]
    img2 = jnp.asarray(g["img2"])
    pols = jnp.asarray(g["pols"])[..., None]  # [1, NE, 1]

    ll1 = losses.log_intensity(img1, use_luma=False, linlog=True)
    ll2 = losses.log_intensity(img2, use_luma=False, linlog=True)
    delta = ll2 - ll1

    # case 1: C_thres=0.2, event_only
    np.testing.assert_allclose(np.asarray(delta), g["cthres_delta_linlog"], atol=1e-5)
    le = losses.event_loss(delta, pols, C_thres=0.2)
    np.testing.assert_allclose(float(le), g["cthres_loss_evs"], rtol=1e-5)
    np.testing.assert_allclose(float(le), g["cthres_loss"], rtol=1e-5)

    # case 2: normalized loss (C_thres=-1), event_only (x20)
    ln = losses.event_loss(delta, pols, C_thres=-1, event_only=True)
    np.testing.assert_allclose(float(ln), g["norm_loss_evs"], rtol=1e-5)

    # case 3: normalized + rgb frames (x400 + weighted MSE)
    ln2 = losses.event_loss(delta, pols, C_thres=-1, event_only=False)
    np.testing.assert_allclose(float(ln2), g["norm_rgb_loss_evs"], rtol=1e-5)
    lf = losses.mse_loss(jnp.asarray(g["frames_pred"]), jnp.asarray(g["frames"]))
    np.testing.assert_allclose(float(lf), g["norm_rgb_loss_frames"], rtol=1e-5)
    np.testing.assert_allclose(
        float(ln2) + 1.0 * float(lf), g["norm_rgb_loss"], rtol=1e-5)

    # case 4: C_thres + no-event hinge (w_no_ev=0.7)
    nll1 = losses.log_intensity(jnp.asarray(g["no1"]), use_luma=False, linlog=True)
    nll2 = losses.log_intensity(jnp.asarray(g["no2"]), use_luma=False, linlog=True)
    lno = losses.no_event_loss(nll2 - nll1, C_thres=0.2, w_no_ev=0.7)
    np.testing.assert_allclose(float(lno), g["cthres_noev_loss_no_evs"], rtol=1e-5)
    np.testing.assert_allclose(
        float(le) + float(lno), g["cthres_noev_loss"], rtol=1e-5)


# -------------------------------------------------------------------- poses

def test_slerp_golden():
    from enerf_tpu.data.poses import make_pose_interpolator, get_hom_trafos

    g = _load("slerp.npz")
    poses = np.asarray(get_hom_trafos(g["rots"], g["trans"]))
    q = make_pose_interpolator(g["tss"], poses)
    out = q(g["tq"])  # [N, 3, 4]
    np.testing.assert_allclose(out[:, :3, :3], g["rots_out"], atol=1e-6)
    np.testing.assert_allclose(out[:, :3, 3], g["trans_out"], atol=1e-6)


# --------------------------------------------------------- hash index cases

def _cu_fast_hash(pos_grid):
    """Scalar transliteration of gridencoder.cu:34-50 (D=3)."""
    primes = [1, 2654435761, 805459861]
    h = 0
    for d in range(3):
        h ^= (pos_grid[d] * primes[d]) & 0xFFFFFFFF
        h &= 0xFFFFFFFF
    return h


def _cu_get_grid_index(gridtype_hash, hashmap_size, resolution, pos_grid):
    """Scalar transliteration of gridencoder.cu:53-71 (C=2, align_corners
    false is not modeled — the reference calls with default stride rules)."""
    stride = 1
    index = 0
    d = 0
    while d < 3 and stride <= hashmap_size:
        # uint32 arithmetic throughout (gridencoder.cu declares index AND
        # stride uint32_t) — the wrap point matters for large tiled grids
        index = (index + pos_grid[d] * stride) & 0xFFFFFFFF
        stride = (stride * (resolution + 1)) & 0xFFFFFFFF
        d += 1
    if gridtype_hash and stride > hashmap_size:
        index = _cu_fast_hash(pos_grid)
    return index % hashmap_size


def test_hash_index_scalar_cases():
    """Verify hash_encode's index math on hand-computable corner cases
    against the scalar CUDA transliteration: a table with table[i,0] = i
    turns the encode output into a weighted sum of indices."""
    from enerf_tpu.ops.hashgrid import HashGridMeta, hash_encode

    meta = HashGridMeta(num_levels=6, level_dim=2, base_resolution=4,
                        log2_hashmap_size=7, per_level_scale=2.0)
    table = np.zeros((meta.total_entries, 2), np.float32)
    table[:, 0] = np.arange(meta.total_entries) % 997  # keep values small

    rng = np.random.RandomState(7)
    xs = rng.uniform(0.0, 1.0, (24, 3)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(xs), jnp.asarray(table), meta))

    for n in range(xs.shape[0]):
        for lvl in range(meta.num_levels):
            scale = np.float32(meta.scales[lvl])
            size = int(meta.sizes[lvl])
            res = int(meta.resolutions[lvl])
            is_hashed = bool(meta.is_hashed[lvl])
            off = int(meta.offsets[lvl])
            pos = xs[n] * scale + np.float32(0.5)
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            expected = 0.0
            for c in range(8):
                corner = [int(pg[d] + ((c >> d) & 1)) for d in range(3)]
                w = 1.0
                for d in range(3):
                    w *= frac[d] if ((c >> d) & 1) else (1.0 - frac[d])
                idx = _cu_get_grid_index(is_hashed, size, res, corner)
                expected += w * table[off + idx, 0]
            got = out[n, lvl * 2]
            np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-3,
                                       err_msg=f"n={n} lvl={lvl}")


# ------------------------------------------------------- composed network

def test_full_network_golden():
    """The COMPOSED reference NeRFNetwork (network.py:104-214) — hashgrid
    encode -> sigma MLP -> trunc_exp/geo_feat -> SH dir encode -> color MLP
    -> sigmoid — forward AND parameter gradients, frozen from the reference
    running on CPU (scripts/make_goldens.py gen_network)."""
    from enerf_tpu.models.field import (
        FieldStatic, field_forward,
    )

    g = _load("network.npz")
    static = FieldStatic(
        bound=1.0, encoding="hashgrid", out_dim_color=1, sh_degree=4,
        num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=14,
    )
    # golden used desired_resolution=256 (shrunk config; same code path)
    from enerf_tpu.ops.hashgrid import HashGridMeta
    static.grid_meta = HashGridMeta(
        input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=14, desired_resolution=256, gridtype="hash",
    )
    assert static.grid_meta.total_entries == g["embeddings"].shape[0]

    params = {"hash_table": jnp.asarray(g["embeddings"])}
    for i in range(2):
        params[f"sigma_w{i}"] = jnp.asarray(g[f"sigma_w{i}"].T)  # torch [o,i]
    for i in range(3):
        params[f"color_w{i}"] = jnp.asarray(g[f"color_w{i}"].T)

    x, d = jnp.asarray(g["x"]), jnp.asarray(g["d"])
    sigma, color = field_forward(params, static, x, d)
    np.testing.assert_allclose(np.asarray(sigma), g["sigma"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(color), g["color"],
                               rtol=1e-4, atol=1e-5)

    ws, wc = jnp.asarray(g["ws"]), jnp.asarray(g["wc"])

    def loss(p):
        s, c = field_forward(p, static, x, d)
        return jnp.mean(s * ws) + jnp.mean(c * wc)

    grads = jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(grads["hash_table"]),
                               g["d_embeddings"], atol=1e-6)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(grads[f"sigma_w{i}"]),
                                   g[f"d_sigma_w{i}"].T, rtol=1e-3, atol=1e-5)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(grads[f"color_w{i}"]),
                                   g[f"d_color_w{i}"].T, rtol=1e-3, atol=1e-5)
