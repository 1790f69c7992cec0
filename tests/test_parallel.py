"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enerf_tpu.models.field import FieldStatic, init_field_params
from enerf_tpu.parallel.mesh import (
    make_mesh, make_sharded_train_step, replicate, shard_batch,
)
from enerf_tpu.train.state import init_train_state
from enerf_tpu.train.step import StepStatics, train_step_events


def _setup(n_dev):
    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4, log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1,
    )
    n = 16 * n_dev
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    batch = {
        "rays_evs_o1": o, "rays_evs_d1": d,
        "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
        "pols": jnp.ones((n,), jnp.float32),
    }
    return static, state, opt, ss, batch


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_step_runs_and_matches_single_device():
    static, state, opt, ss, batch = _setup(8)

    # single-device result
    s1, a1 = train_step_events(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(2), ss, opt
    )

    # 8-device sharded result
    mesh = make_mesh(8)
    step = make_sharded_train_step(ss, opt, mesh, mode="events")
    s8, a8 = step(replicate(jax.tree.map(jnp.copy, state), mesh),
                  shard_batch(batch, mesh), jax.random.PRNGKey(2))

    np.testing.assert_allclose(float(a1["loss"]), float(a8["loss"]), rtol=1e-4)
    # params identical up to collective reduction order
    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s8.params[k]), atol=1e-5,
            err_msg=f"param {k} diverged between 1-dev and 8-dev step",
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_march_step_matches_single_device():
    """The PRODUCTION path (occupancy march + blockgrid + per-ray
    compaction) must compose with data-parallel sharding: 8-dev == 1-dev.
    """
    from enerf_tpu.render.occupancy import init_occupancy, GRID_SIZE

    static = FieldStatic(
        bound=1.0, out_dim_color=1, num_levels=4, log2_hashmap_size=10,
        encoding="blockgrid",
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1,
        use_march=True, march_samples=16, max_steps=256, compact_frac=0.25,
    )
    # occupancy: ball bitfield so the march emits real samples
    g = np.arange(GRID_SIZE)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    centers = 2.0 * np.stack([xs, ys, zs], -1) / (GRID_SIZE - 1) - 1.0
    ball = np.linalg.norm(centers, axis=-1) < 0.5
    occ = jnp.asarray(ball.reshape(1, -1))

    n = 16 * 8
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    batch = {
        "rays_evs_o1": o, "rays_evs_d1": d,
        "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
        "pols": jnp.ones((n,), jnp.float32),
    }

    s1, a1 = train_step_events(
        jax.tree.map(jnp.copy, state), batch, jax.random.PRNGKey(2), ss, opt, occ
    )

    mesh = make_mesh(8)
    step = make_sharded_train_step(ss, opt, mesh, mode="events")
    s8, a8 = step(replicate(jax.tree.map(jnp.copy, state), mesh),
                  shard_batch(batch, mesh), jax.random.PRNGKey(2),
                  replicate(occ, mesh))

    assert float(a1["loss"]) > 0.0  # the march actually rendered something
    np.testing.assert_allclose(float(a1["loss"]), float(a8["loss"]), rtol=1e-4)
    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s8.params[k]), atol=1e-5,
            err_msg=f"param {k} diverged between 1-dev and 8-dev march step",
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 1)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_chunk_events():
    """The fused K-step window (train/chunk.py) composes with the data
    mesh: each chip samples its own event batch inside the program, grads
    pmean over the axis, state stays replicated, loss decreases."""
    from enerf_tpu.data import synthetic
    from enerf_tpu.data.provider import EventProvider
    from enerf_tpu.train.chunk import make_train_chunk

    data = synthetic.simulate_events(H=32, W=32, n_frames=20, C=0.12, turns=0.4)
    prov = EventProvider(
        data["events"], data["frame_ts"], data["poses"], data["intrinsics"],
        32, 32, batch_size_evs=64,
    )
    arrs, statics = prov.sampler_bundle()

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.12, event_only=True, use_luma=False,
        linlog=True, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1,
    )

    mesh = make_mesh(8)
    chunk = make_train_chunk(ss, opt, "events", statics, chunk_len=4,
                             use_occ=False, mesh=mesh)
    losses = []
    key = jax.random.PRNGKey(3)
    occ = None
    for _ in range(4):
        key, k = jax.random.split(key)
        state, occ, _, aux = chunk(state, occ, arrs, None, k)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "sharded chunk did not reduce loss"
    # state must remain replicated and consistent across all 8 shards
    p0 = next(iter(state.params.values()))
    assert p0.sharding.is_fully_replicated
    for shard in p0.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), np.asarray(p0))
    assert int(state.step) == 16  # 4 windows x 4 inner steps


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_chunk_frames_error_map():
    """Frames mode under the sharded chunk: the per-chip error-map scatter
    updates merge back into ONE replicated map (base + psum of deltas)."""
    from enerf_tpu.data import synthetic
    from enerf_tpu.data.provider import FramesProvider
    from enerf_tpu.train.chunk import make_train_chunk

    imgs = np.random.default_rng(0).uniform(
        size=(3, 16, 16, 1)).astype(np.float32)
    poses = np.stack([synthetic.circle_pose(t) for t in (0.0, 0.2, 0.4)])
    prov = FramesProvider(imgs, poses, synthetic.default_intrinsics(16, 16),
                          num_rays=32, error_map=True)
    arrs, statics = prov.sampler_bundle()

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=100)
    ss = StepStatics(
        field_static=static, num_steps=16, upsample_steps=0, min_near=0.2,
        density_scale=1.0, C_thres=0.2, event_only=False, use_luma=False,
        linlog=False, weight_loss_rgb=1.0, negative_event_sampling=False,
        w_no_ev=1.0, out_dim_color=1,
    )

    mesh = make_mesh(8)
    chunk = make_train_chunk(ss, opt, "frames", statics, chunk_len=2,
                             use_occ=False, mesh=mesh)
    emap = prov.error_map
    before = np.asarray(emap).copy()
    state, _, emap, aux = chunk(state, None, arrs, emap, jax.random.PRNGKey(5))
    assert np.isfinite(float(aux["loss"]))
    after = np.asarray(emap)
    assert emap.sharding.is_fully_replicated
    assert (after != before).sum() > 0, "error map not updated"
    assert np.isfinite(after).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_occupancy_update_matches_serial():
    """update_occupancy_sharded under shard_map: full phase covers every
    cell exactly once across lanes; statistics match the serial update
    (per-cell RNG noise differs, so compare coverage + summary stats)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from enerf_tpu.render.occupancy import (
        init_occupancy, update_occupancy, update_occupancy_sharded,
    )

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10)
    params = init_field_params(jax.random.PRNGKey(0), static)
    occ0 = init_occupancy(1.0)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, in_shardings=(repl, repl, repl),
                       out_shardings=repl)
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P()), out_specs=P())
    def sharded(params, occ, key):
        return update_occupancy_sharded(
            params, static, occ, key, axis_name="data", n_lanes=8)

    o_sh = sharded(params, occ0, jax.random.PRNGKey(3))
    o_se = update_occupancy(params, static, occ0, jax.random.PRNGKey(3))

    # full phase: lanes split the serial update's 64 query chunks with the
    # serial keys -> bitwise-equal result (up to the psum merge rounding)
    assert bool((np.asarray(o_sh.density_grid) >= 0.0).all())
    assert int(o_sh.iter_density) == 1
    np.testing.assert_allclose(np.asarray(o_sh.density_grid),
                               np.asarray(o_se.density_grid),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(o_sh.occ_bitfield),
                                  np.asarray(o_se.occ_bitfield))

    # partial (resampling) phase runs and keeps the grid sane
    o_sh2 = sharded(params, o_sh._replace(iter_density=jnp.asarray(20)),
                    jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(o_sh2.density_grid)).all()
    assert int(o_sh2.iter_density) == 21


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multihost_utilities_single_process():
    """Single-process behavior of the pod-slice glue (parallel/multihost.py):
    global mesh over all devices, host-local batch assembly == shard_batch,
    replication, barrier no-op."""
    from enerf_tpu.parallel import multihost

    multihost.initialize()
    assert multihost.is_primary()
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())

    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    g = multihost.host_local_batch_to_global(batch, mesh)
    ref = shard_batch({"x": jnp.asarray(batch["x"])}, make_mesh(None))
    assert g["x"].sharding.spec == ref["x"].sharding.spec
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])

    r = multihost.replicate_from_host({"y": np.ones((4,), np.float32)}, mesh)
    assert r["y"].sharding.is_fully_replicated
    multihost.all_processes_barrier("test")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_eval_render_matches_single_device():
    """Multi-chip eval tiling (SURVEY M5): rays sharded over the mesh,
    image gathered — must equal the single-device render."""
    from enerf_tpu.parallel.mesh import make_sharded_render
    from enerf_tpu.render.march import render_rays_march
    from enerf_tpu.render.occupancy import GRID_SIZE

    static = FieldStatic(bound=1.0, out_dim_color=1, num_levels=4,
                         log2_hashmap_size=10, encoding="blockgrid")
    params = init_field_params(jax.random.PRNGKey(0), static)
    g = np.arange(GRID_SIZE)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    c = 2.0 * np.stack([xs, ys, zs], -1) / (GRID_SIZE - 1) - 1.0
    occ = jnp.asarray((np.linalg.norm(c, axis=-1) < 0.5).reshape(1, -1))

    n = 131  # deliberately not divisible by 8 (padding path)
    rng = np.random.RandomState(0)
    o = np.tile(np.array([[0., 0., -2.5]], np.float32), (n, 1))
    tgt = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o, d = jnp.asarray(o), jnp.asarray(d)

    single = render_rays_march(
        params, static, occ, o, d, num_samples=32, max_steps=256,
        bg_color=1.0, min_near=0.2)

    mesh = make_mesh(8)
    render = make_sharded_render(static, mesh, num_samples=32, max_steps=256)
    sharded = render(replicate(params, mesh), replicate(occ, mesh), o, d)

    np.testing.assert_allclose(np.asarray(sharded["image"]),
                               np.asarray(single["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sharded["depth"]),
                               np.asarray(single["depth"]), atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
@pytest.mark.slow
def test_march_warmup_applies_on_sharded_per_step_path(tmp_path):
    """--march_warmup must switch the renderer on the mesh PER-STEP path
    (fuse_steps=1) too, not only the fused-chunk path: the trainer builds
    a warm (use_march=False) sharded step for the warmup iters."""
    from enerf_tpu.config import build_config
    from enerf_tpu.train.trainer import Trainer
    from enerf_tpu.data.provider import make_providers

    cfg = build_config([
        "--mode", "synthetic", "--events", "1", "--event_only", "1",
        "--out_dim_color", "1", "--H", "16", "--W", "16",
        "--syn_frames", "6", "--C_thres", "0.2", "--bound", "1.0",
        "--cuda_ray", "--batch_size_evs", "32", "--march_samples", "4",
        "--max_steps", "32", "--num_steps", "8", "--iters", "8",
        "--fuse_steps", "1", "--march_warmup", "4",
        "--outdir", str(tmp_path), "--ckpt", "scratch",
    ])
    trainer = Trainer(cfg, use_checkpoint="scratch", mesh=make_mesh(8))
    train, _ = make_providers(cfg, {})
    train.steps_per_epoch = 8
    trainer.train(train, None, max_epoch=1)
    assert int(trainer.state.step) == 8
    # both the warm and the march sharded steps were built and used
    assert set(trainer._sharded_steps.keys()) == {True, False}
