"""Fused multi-step training: K sampler+step iterations plus one occupancy
maintenance update compiled into ONE XLA program via lax.scan.

Why: every dispatched program costs a host round-trip (severe over a remote
TPU tunnel, still material on pods), and the reference's loop shape —
sample batch, train step, occupancy update every 16 iters
(nerf/utils.py:575-636, 944-947) — is 2-3 dispatches per iteration.  Here
the whole 16-step cadence window is a single program: the occupancy update
runs first (matching the reference's `global_step % 16 == 0` gate), then
lax.scan drives 16 {sample, grad, Adam, EMA, error-map} iterations with the
bitfield frozen for the window, exactly like the reference which also
queries the grid state as-of the last maintenance step.

TPU design: batch SAMPLING lives inside the program too (the providers'
samplers are pure jnp — data/provider.py), so the only per-window host work
is feeding the RNG key.  The per-step LR schedule and EMA warmup advance
per inner step because TrainState.step is in the scan carry.

Multi-chip: pass a mesh and the same program runs under shard_map over the
('data',) axis — each chip folds its axis index into the sampling key and
draws its OWN batch from the replicated dataset arrays (so the global batch
is n_devices x the per-chip batch), the gradient mean becomes a psum over
ICI, and parameters/optimizer/EMA stay replicated because every chip applies
the identical pmean'd update.  This is the role of the reference's dead DDP
scaffolding (utils.py:351-354) composed with its CUDA train loop — which the
reference never achieves — in one XLA program per 16-step window.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from enerf_tpu.render.occupancy import update_occupancy
from enerf_tpu.train.step import event_loss_fn, frames_loss_fn
from enerf_tpu.train.state import apply_updates


def make_train_chunk(ss, opt, mode, sampler_statics, chunk_len=16,
                     use_occ=True, freeze_occ=False,
                     density_scale=1.0, density_thresh=0.01,
                     mesh=None):
    """Build chunk(state, occ, arrs, error_map, key) -> (state, occ,
    error_map, aux).

    mode: 'events' | 'frames'.  sampler_statics: the static kwargs for the
    matching provider sampler (data/provider.py _event_sample_jit /
    _frames_sample_jit).  arrs: the provider's device-array bundle
    (EventProvider._sampler_arrays / FramesProvider._sampler_arrays).
    aux is the per-window mean of every scalar the steps report.

    mesh: optional jax.sharding.Mesh with a 'data' axis — the chunk then
    runs data-parallel (see module docstring); all five arguments are
    replicated and the per-chip sample batch size comes from
    sampler_statics, so the effective global batch is mesh.size x larger.
    """
    statics = dict(sampler_statics)

    def sample(key, arrs, error_map):
        # jit-wrapped sampler calls inline when traced inside this program
        if mode == "events":
            from enerf_tpu.data.provider import _event_sample_jit
            return _event_sample_jit(key, arrs, **statics), None, None
        from enerf_tpu.data.provider import _frames_sample_jit
        batch, fi, inds_coarse = _frames_sample_jit(
            key, arrs["poses"], arrs["images"], error_map,
            arrs["intrinsics"], **statics,
        )
        return batch, fi, inds_coarse

    loss_fn = event_loss_fn if mode == "events" else frames_loss_fn
    dp = mesh is not None

    n_lanes = mesh.devices.size if dp else 1

    def chunk_impl(state, occ, arrs, error_map, key):
        # freeze_occ (cfg.occ_freeze_after): keep serving the bitfield to
        # the march but stop the EMA maintenance — breaks the
        # occupancy<->density mist feedback loop (round-4 diagnosis)
        if use_occ and not freeze_occ:
            key, k = jax.random.split(key)
            if dp:
                # each chip queries 1/n of the grid cells; one psum merges
                from enerf_tpu.render.occupancy import update_occupancy_sharded
                occ = update_occupancy_sharded(
                    state.params, ss.field_static, occ, k,
                    axis_name="data", n_lanes=n_lanes,
                    density_scale=density_scale,
                    density_thresh=density_thresh,
                )
            else:
                occ = update_occupancy(
                    state.params, ss.field_static, occ, k,
                    density_scale=density_scale,
                    density_thresh=density_thresh,
                )
        occ_bf = occ.occ_bitfield if use_occ else None
        emap_in = error_map

        if dp:
            my_lane = jax.lax.axis_index("data")
            if error_map is not None:
                # the scatter updates below are chip-varying; mark the scan
                # carry as such up front
                error_map = jax.lax.pcast(error_map, "data", to="varying")

        def body(carry, k):
            state, emap = carry
            if dp:
                k = jax.random.fold_in(k, my_lane)
            k1, k2 = jax.random.split(k)
            batch, fi, inds_coarse = sample(k1, arrs, emap)
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, ss, batch, k2, occ_bf)
            if dp:
                grads = jax.lax.pmean(grads, "data")
            state = apply_updates(state, grads, opt)
            if emap is not None and inds_coarse is not None:
                old = emap[fi, inds_coarse]
                emap = emap.at[fi, inds_coarse].set(
                    0.1 * old + 0.9 * aux["per_ray_loss"])
            scalars = {"loss": loss}
            scalars.update(
                (n, v) for n, v in aux.items()
                if isinstance(v, jnp.ndarray) and v.ndim == 0
                # implC medians sort the whole batch — fine on one chip,
                # but under dp they would be computed per chip anyway;
                # keep the dp program free of non-essential reductions
                and not (dp and n.startswith("implC_"))
            )
            if dp:
                scalars = jax.lax.pmean(scalars, "data")
            return (state, emap), scalars

        (state, error_map), auxs = jax.lax.scan(
            body, (state, error_map), jax.random.split(key, chunk_len))
        if dp and error_map is not None:
            # merge the chips' scatter updates back to one replicated map:
            # base + sum of per-chip deltas.  Cross-chip collisions on the
            # same slot add their (usually negative) deltas, which can
            # overshoot below zero — floor at a small positive weight so the
            # next window's log-categorical sampling (data/rays.py) stays
            # finite; it is a sampling prior, not a metric
            error_map = jnp.maximum(
                emap_in + jax.lax.psum(error_map - emap_in, "data"), 1e-4)
        return state, occ, error_map, jax.tree.map(jnp.mean, auxs)

    if not dp:
        return jax.jit(chunk_impl, donate_argnums=(0, 1, 3))

    repl = NamedSharding(mesh, P())
    sharded = jax.shard_map(
        chunk_impl, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return jax.jit(
        sharded,
        in_shardings=(repl, repl, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 3),
    )
