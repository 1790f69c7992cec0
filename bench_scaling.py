"""Multi-chip scaling-efficiency harness: rays/s at 1..N devices.

Driver north star (BASELINE.json): ">=80% rays/s scaling efficiency on a
multi-host pod slice".  This harness runs the production sharded event
train step over meshes of increasing size and reports throughput +
efficiency vs linear scaling from 1 device.

On this round's single-chip environment it degenerates to the 1-chip row on
TPU; run with ENERF_PLATFORM=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the scaling mechanics on a virtual mesh (numbers are then about
correctness, not speed).  Prints one JSON line per mesh size.
"""

import json
import os
import time

if os.environ.get("ENERF_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["ENERF_PLATFORM"])

import jax
import jax.numpy as jnp


def main():
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.parallel.mesh import (
        make_mesh, make_sharded_train_step, replicate, shard_batch,
    )
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics

    n_dev_total = len(jax.devices())
    rays_per_dev = 4096
    on_cpu = jax.devices()[0].platform == "cpu"
    num_steps = 8 if on_cpu else 64

    static = FieldStatic(
        bound=1.0, out_dim_color=1,
        num_levels=4 if on_cpu else 16,
        log2_hashmap_size=10 if on_cpu else 19,
        encoding="blockgrid",
        compute_dtype=jnp.float32 if on_cpu else jnp.bfloat16,
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    ss = StepStatics(
        field_static=static, num_steps=num_steps, upsample_steps=0,
        min_near=0.2, density_scale=1.0, C_thres=0.2, event_only=True,
        use_luma=False, linlog=True, weight_loss_rgb=1.0,
        negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
        # PRODUCTION path: occupancy march + compaction (the same step
        # bench.py measures single-chip)
        use_march=True, march_samples=8 if on_cpu else 32,
        max_steps=256 if on_cpu else 1024, compact_frac=0.25,
    )
    import numpy as np
    from enerf_tpu.render.occupancy import GRID_SIZE
    g = np.arange(GRID_SIZE)
    xs, ys, zs = np.meshgrid(g, g, g, indexing="ij")
    centers = 2.0 * np.stack([xs, ys, zs], -1) / (GRID_SIZE - 1) - 1.0
    occ = jnp.asarray((np.linalg.norm(centers, axis=-1) < 0.48).reshape(1, -1))

    base_rate = None
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev_total]
    for n_dev in sizes:
        state, opt = init_train_state(
            jax.tree.map(jnp.copy, params), lr0=1e-2, iters=10000
        )
        mesh = make_mesh(n_dev)
        step = make_sharded_train_step(ss, opt, mesh, mode="events")

        n = rays_per_dev * n_dev
        key = jax.random.PRNGKey(1)
        d = jax.random.normal(key, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
        batch = shard_batch({
            "rays_evs_o1": o, "rays_evs_d1": d,
            "rays_evs_o2": o + 0.01, "rays_evs_d2": d,
            "pols": jnp.ones((n,), jnp.float32),
        }, mesh)
        state = replicate(state, mesh)
        occ_r = replicate(occ, mesh)

        state, scalars = step(state, batch, jax.random.PRNGKey(2), occ_r)
        float(scalars["loss"])
        iters = 5
        t0 = time.perf_counter()
        for i in range(iters):
            state, scalars = step(state, batch, jax.random.PRNGKey(3 + i), occ_r)
        float(scalars["loss"])
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / iters

        rate = 2 * n / dt  # two renders' worth of rays per step
        if base_rate is None:
            base_rate = rate / n_dev
        eff = rate / (base_rate * n_dev)
        print(json.dumps({
            "metric": "scaling_rays_per_s",
            "n_devices": n_dev,
            "value": round(rate, 1),
            "unit": "rays/s",
            "efficiency_vs_linear": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
