"""Benchmark: rays/s/chip, forward+backward, 1024 samples/ray.

Driver metric (BASELINE.json): "rays/s/chip fwd+bwd at 1024 samples/ray".
The reference publishes no numbers (BASELINE.md); the anchor used for
vs_baseline is an estimate of the reference PyTorch path on its tested
RTX A4000: the enerf configs push 30096 rays x 512 samples through
hash-encode + 2 MLPs twice (fwd+bwd) per event render at roughly 3 it/s
=> ~9e7 samples/s ~= 90k rays/s at 1024 samples/ray.  Prints ONE JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_RAYS_S = 90_000.0  # estimated reference anchor (see module docstring)


def main():
    from enerf_tpu.models.field import FieldStatic, init_field_params
    from enerf_tpu.render.renderer import render_rays
    from enerf_tpu.train.state import init_train_state
    from enerf_tpu.train.step import StepStatics, train_step_frames

    n_rays = 4096
    num_steps = 1024

    static = FieldStatic(
        bound=1.0, out_dim_color=1, compute_dtype=jnp.bfloat16
    )
    params = init_field_params(jax.random.PRNGKey(0), static)
    state, opt = init_train_state(params, lr0=1e-2, iters=10000)
    ss = StepStatics(
        field_static=static, num_steps=num_steps, upsample_steps=0,
        min_near=0.2, density_scale=1.0, C_thres=0.2, event_only=False,
        use_luma=False, linlog=True, weight_loss_rgb=1.0,
        negative_event_sampling=False, w_no_ev=1.0, out_dim_color=1,
    )

    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (n_rays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n_rays, 1))
    gt = jnp.ones((n_rays, 1), jnp.float32) * 0.5
    batch = {"rays_o": o, "rays_d": d, "images": gt}

    # warmup/compile
    state, aux = train_step_frames(state, batch, jax.random.PRNGKey(2), ss, opt)
    jax.block_until_ready(state.params)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, aux = train_step_frames(
            state, batch, jax.random.PRNGKey(3 + i), ss, opt
        )
    jax.block_until_ready(state.params)
    dt = (time.perf_counter() - t0) / iters

    rays_s = n_rays / dt
    print(json.dumps({
        "metric": "rays_per_s_per_chip_fwd_bwd_1024spp",
        "value": round(rays_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_s / BASELINE_RAYS_S, 3),
    }))


if __name__ == "__main__":
    main()
