"""Multi-chip scaling: mesh construction + sharded train steps.

Parity note (SURVEY.md section 2.3): the reference carries vestigial,
never-activated torch DDP scaffolding (utils.py:351-354, NCCL all_reduce /
all_gather in the dead eval path).  This framework makes data parallelism
first-class and TPU-native:

  - a jax.sharding.Mesh over a ('data',) axis (pod-slice-ready),
  - ray/event batches sharded along axis 0 over 'data',
  - parameters, optimizer state and EMA replicated,
  - gradient all-reduce emerges as an XLA psum over ICI, overlapped with
    the backward pass by the latency-hiding scheduler — there is no
    explicit communication code to maintain (the mesh + PartitionSpec IS
    the backend).

The model itself (hash table + 2 tiny MLPs) has no tensor/pipeline/sequence
parallel axes worth sharding at reference scale (documented out-of-scope in
SURVEY.md section 2.3); the scale axis is rays/events per step, which this
module shards.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from enerf_tpu.train.step import frames_loss_fn, event_loss_fn
from enerf_tpu.train.state import apply_updates


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch, mesh):
    """Place each [N, ...] leaf sharded along axis 0 of the 'data' axis."""
    sh = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def make_sharded_train_step(ss, opt, mesh, mode="events"):
    """Build the jitted data-parallel train step for a mesh.

    state: replicated; batch: sharded over 'data' along axis 0; rng:
    replicated (each chip derives its lane keys from the same seed + its
    ray indices being distinct slices); occupancy bitfield: replicated
    (read-only inside the step; maintained by update_occupancy off the hot
    path).  The mean loss over the global batch makes XLA emit a psum over
    ICI for the parameter gradients.

    The production march path (ss.use_march) composes with the sharding:
    the DDA march, per-ray compaction, field eval and composite are all
    batch-axis-local ops (render/march.py packs per ray, never across the
    batch), so the ONLY collective in the compiled program is the gradient
    psum.

    Returns a callable (state, batch, rng, occ=None) -> (state, scalars).
    """
    loss_fn = event_loss_fn if mode == "events" else frames_loss_fn
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    def step(state, batch, rng, occ):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, ss, batch, rng, occ
        )
        new_state = apply_updates(state, grads, opt)
        # implC_* medians are deliberately NOT forwarded here: under the
        # sharded step a median over the global batch would make XLA emit
        # an all-gather + global sort per step, breaking this module's
        # only-collective-is-the-grad-psum contract.  The telemetry stays
        # on the single-chip paths (train_step_events, non-dp chunk).
        scalars = {"loss": loss}
        for k in ("loss_evs", "loss_frames", "loss_no_evs", "loss_opacity"):
            if k in aux:
                scalars[k] = aux[k]
        if mode == "frames":
            # error-map feedback (gathered to replicated on output)
            scalars["per_ray_loss"] = aux["per_ray_loss"]
        return new_state, scalars

    if ss.use_march:
        jitted = jax.jit(
            step,
            in_shardings=(repl, shard, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

        def run(state, batch, rng, occ=None):
            assert occ is not None, (
                "use_march=True: the sharded step needs the occupancy "
                "bitfield (pass trainer.occupancy.occ_bitfield)"
            )
            return jitted(state, batch, rng, occ)

        return run

    jitted = jax.jit(
        lambda state, batch, rng: step(state, batch, rng, None),
        in_shardings=(repl, shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    return lambda state, batch, rng, occ=None: jitted(state, batch, rng)


def make_sharded_render(static, mesh, *, num_samples=128, max_steps=1024,
                        min_near=0.2, density_scale=1.0, dt_gamma=0.0):
    """Sharded full-image render: rays split over the 'data' axis, params +
    occupancy replicated, image tiles gathered (the role of the reference's
    dead dist.all_gather eval path, utils.py:1064-1079 — here the gather
    is emitted by XLA from the output sharding and rides ICI/DCN).

    Returns render(params, occ_bitfield, rays_o, rays_d) -> dict; ray count
    is padded to a multiple of the mesh size internally.
    """
    from enerf_tpu.render.march import render_rays_march

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    n_dev = mesh.devices.size

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, shard, shard),
        out_shardings=repl,
    )
    def _render(params, occ, ro, rd):
        return render_rays_march(
            params, static, occ, ro, rd,
            num_samples=num_samples, max_steps=max_steps, bg_color=1.0,
            min_near=min_near, density_scale=density_scale,
            dt_gamma=dt_gamma,
        )

    def render(params, occ, rays_o, rays_d):
        N = rays_o.shape[0]
        pad = (-N) % n_dev
        if pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.ones((pad, 3), rays_o.dtype)], 0)
            rays_d = jnp.concatenate(
                [rays_d, jnp.ones((pad, 3), rays_d.dtype)], 0)
        out = _render(params, occ,
                      jax.device_put(rays_o, shard),
                      jax.device_put(rays_d, shard))
        return jax.tree.map(lambda x: x[:N], out)

    return render
