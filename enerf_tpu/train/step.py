"""Jit-compiled training steps: frame (RGB) mode and event mode.

Parity: reference nerf/utils.py:575-636 (train_step: MSE on sampled pixels
with pixel-wise random background) and :482-573 (train_step_events: paired
renders at (pose_before, pose_at), log-intensity difference supervised by
polarity * C, optional RGB-frame and no-event terms).

TPU design: each step is one pure function (state, batch, rng) -> (state,
aux) compiled once; both event renders and the backward pass live in a
single XLA program.  Data-parallel scaling needs no code change here — the
trainer jits these with batch args sharded over the mesh's 'data' axis and
the state replicated, and XLA inserts the psum for the gradients.
"""

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from enerf_tpu.render.renderer import render_rays
from enerf_tpu.train import losses
from enerf_tpu.train.state import TrainState, apply_updates


class StepStatics(NamedTuple):
    """Static (hashable) bundle for jit."""
    field_static: Any
    num_steps: int
    upsample_steps: int
    min_near: float
    density_scale: float
    C_thres: float
    event_only: bool
    use_luma: bool
    linlog: bool
    weight_loss_rgb: float
    negative_event_sampling: bool
    w_no_ev: float
    out_dim_color: int
    # occupancy-march training path (the reference's cuda_ray branch):
    use_march: bool = False
    march_samples: int = 32
    max_steps: int = 1024
    dt_gamma: float = 0.0
    compact_frac: Any = 0.5
    # event pairs: march once on the first ray of the pair and reuse its
    # sample t-values for the second (the poses differ by ~one event
    # spacing) — halves DDA work and correlates the pair's sampling
    share_march: bool = False
    # rand-pose semantic guidance (the reference's clip_utils role, wired):
    # a hashable JAX embedder (train/clip_guidance.StubEmbedder or a real
    # JAX CLIP) — None disables the clip step
    clip_embedder: Any = None
    # opacity binary-entropy regularizer on event-ray weight sums (BEYOND
    # the reference): -log(ws^2 + (1-ws)^2) pushes rays to transparent-or-
    # opaque, breaking the transparent-mist gauge mode of consecutive-pair
    # event supervision (ROUND2_STATUS.md).  0 disables.
    w_opacity: float = 0.0
    # mip-NeRF-360-style distortion regularizer on event-ray sample
    # weights (BEYOND the reference): penalizes weight mass spread along
    # the ray, collapsing the diffuse-mist density the opacity regularizer
    # could not break (ROUND2_STATUS.md "mist gauge mode").  0 disables.
    w_distortion: float = 0.0
    # rematerialize the fixed-step renderer in backward (jax.checkpoint):
    # at num_steps=128+ every fixed-step render holds ~[N*S, L*C]-sized AD
    # residuals, and the event loss can issue FOUR of them (event pair +
    # negative pair) — 4 concurrent residual sets OOM a 16 GB chip at the
    # production batch.  Remat trades one extra forward per render for
    # peak memory of ONE residual set.  Auto-enabled for march_warmup
    # phases (warm_statics); --remat_fixed forces it for pure fixed-step
    # runs.  Modes: 0 = off, 1 = full remat (backward re-runs the encode
    # gathers), 2 = save-encode policy (keeps the [N, L*C] encode output,
    # ~64 MB bf16 at 1M points, so backward skips the gather re-run —
    # faster than 1 when it fits).
    remat_fixed: int = 0
    # fixed-step sample count during march_warmup phases only (0 = use
    # num_steps).  The warmup program is encoder-address-rate bound (four
    # fixed-step renders of num_rays*num_steps samples each), so a smaller
    # warmup sample count buys near-linear warmup speedup; the opacity
    # carve it exists for does not need eval-grade sampling density.
    warmup_num_steps: int = 0


def distortion_loss(weights, ts, dts):
    """mip-NeRF 360 eq. 15 on sorted samples, O(S):

    L = sum_ij w_i w_j |t_i - t_j| + (1/3) sum_i w_i^2 dt_i
      = 2 sum_i w_i (t_i W_<i - S_<i) + (1/3) sum_i w_i^2 dt_i

    weights/ts/dts: [N, S] (ts ascending per ray; invalid slots must carry
    weight 0).  Returns the per-batch mean.
    """
    cw = jnp.cumsum(weights, axis=-1)
    cwt = jnp.cumsum(weights * ts, axis=-1)
    w_before = cw - weights
    s_before = cwt - weights * ts
    cross = 2.0 * jnp.sum(weights * (ts * w_before - s_before), axis=-1)
    self_term = jnp.sum(weights * weights * dts, axis=-1) / 3.0
    return jnp.mean(cross + self_term)


def _render_pair_shared(params, ss, o1, d1, o2, d2, bg, rng, occ):
    """One DDA march on the first ray of a correlated pair; both renders
    composite from its sample t-values (StepStatics.share_march)."""
    from enerf_tpu.ops.aabb import near_far_from_aabb
    from enerf_tpu.render.march import march_rays, composite_from_march
    fs = ss.field_static
    b = fs.bound
    aabb = jnp.asarray([-b, -b, -b, b, b, b], jnp.float32)
    nears, fars = near_far_from_aabb(o1, d1, aabb, ss.min_near)
    ts, dts, valid = march_rays(
        o1, d1, occ, nears, fars, rng,
        num_samples=ss.march_samples, max_steps=ss.max_steps,
        cascades=occ.shape[0], bound=b, dt_gamma=ss.dt_gamma,
        perturb=True,
    )
    outs = tuple(
        composite_from_march(
            params, fs, o, d, ts, dts, valid, nears, fars,
            bg_color=bg, density_scale=ss.density_scale,
            compact_frac=ss.compact_frac,
            return_weights=ss.w_distortion > 0.0,
        )
        for o, d in ((o1, d1), (o2, d2))
    )
    return outs


def _render(params, ss, rays_o, rays_d, bg, rng, occ_bitfield=None):
    if ss.use_march and occ_bitfield is not None:
        from enerf_tpu.render.march import render_rays_march
        return render_rays_march(
            params, ss.field_static, occ_bitfield, rays_o, rays_d,
            num_samples=ss.march_samples, max_steps=ss.max_steps,
            bg_color=bg, perturb=True, rng=rng, min_near=ss.min_near,
            density_scale=ss.density_scale, dt_gamma=ss.dt_gamma,
            compact_frac=ss.compact_frac,
            return_weights=ss.w_distortion > 0.0,
        )
    def _fixed(params, rays_o, rays_d, bg, rng):
        return render_rays(
            params, ss.field_static, rays_o, rays_d,
            num_steps=ss.num_steps, upsample_steps=ss.upsample_steps,
            bg_color=bg, perturb=True, rng=rng, train=True,
            min_near=ss.min_near, density_scale=ss.density_scale,
        )

    if ss.remat_fixed == 2:
        _fixed = jax.checkpoint(
            _fixed,
            policy=jax.checkpoint_policies.save_only_these_names(
                "encode_out"),
        )
    elif ss.remat_fixed:
        _fixed = jax.checkpoint(_fixed)
    return _fixed(params, rays_o, rays_d, bg, rng)


def warm_statics(ss):
    """StepStatics for a march_warmup phase: uniform fixed-step sampling
    (march + share off) with the renderer rematerialized.  The warm
    program is the peak-memory shape only when warmup_num_steps is 0
    (full num_steps); a smaller warmup_num_steps shrinks the warm
    render's residuals below the march program's (StepStatics.remat_fixed).
    warmup_num_steps (when set) replaces num_steps for this phase only."""
    return ss._replace(use_march=False, share_march=False,
                       num_steps=int(ss.warmup_num_steps) or ss.num_steps,
                       remat_fixed=max(int(ss.remat_fixed), 1))


def frames_loss_fn(params, ss, batch, rng, occ=None):
    """MSE frame loss with pixel-wise random background (utils.py:586-604)."""
    k_bg, k_r = jax.random.split(rng)
    images = batch["images"]  # [N, C] or [N, C+1]
    C = ss.out_dim_color
    bg = jax.random.uniform(k_bg, (images.shape[0], C))
    if images.shape[-1] == C + 1:  # alpha compositing against random bg
        gt = images[..., :C] * images[..., C:] + bg * (1.0 - images[..., C:])
    else:
        gt = images
    out = _render(params, ss, batch["rays_o"], batch["rays_d"], bg, k_r, occ)
    per_ray = jnp.mean((out["image"] - gt) ** 2, axis=-1)  # [N]
    loss = jnp.mean(per_ray)
    return loss, {"loss_frames": loss, "pred": out["image"], "gt": gt,
                  "per_ray_loss": per_ray}


def event_loss_fn(params, ss, batch, rng, occ=None):
    """Event photometric loss on paired renders (utils.py:482-573)."""
    k_bg, k1, k2, k3, k4, k5, kf = jax.random.split(rng, 7)
    N = batch["rays_evs_o1"].shape[0]
    C = ss.out_dim_color
    # one random bg shared by both renders of the pair (utils.py:487)
    bg = jnp.broadcast_to(jax.random.uniform(k_bg, (1, C)), (N, C))

    if ss.use_march and ss.share_march and occ is not None:
        out1, out2 = _render_pair_shared(
            params, ss, batch["rays_evs_o1"], batch["rays_evs_d1"],
            batch["rays_evs_o2"], batch["rays_evs_d2"], bg, k1, occ,
        )
    else:
        out1 = _render(params, ss, batch["rays_evs_o1"], batch["rays_evs_d1"], bg, k1, occ)
        out2 = _render(params, ss, batch["rays_evs_o2"], batch["rays_evs_d2"], bg, k2, occ)
    ll1 = losses.log_intensity(out1["image"], ss.use_luma, ss.linlog)
    ll2 = losses.log_intensity(out2["image"], ss.use_luma, ss.linlog)
    delta = ll2 - ll1  # [N, 1 or C]
    pol = batch["pols"][:, None]  # [N, 1]
    # batch-normalized loss normalizes over the event axis: add batch dim
    loss_evs = losses.event_loss(
        delta[None], pol[None], ss.C_thres, event_only=ss.event_only
    )
    loss = loss_evs
    aux = {"loss_evs": loss_evs, "delta_linlog": delta, "pols": pol}
    # implicit-C telemetry (reference utils.py:514-516, 985-989): medians
    # of delta/pol — a physics sanity check logged per train step
    aux.update(
        (f"implC_{k}", jax.lax.stop_gradient(v))
        for k, v in losses.estimate_implicit_C(pol, delta).items()
    )

    if "weights_sum" in out1:
        # mist telemetry (round-2 diagnosis; VERDICT r4 item 1): mean ray
        # opacity of the first render — the gauge-mode indicator.  A misty
        # field sits well below 1; an opaque carve approaches it.
        aux["ws_mean"] = jax.lax.stop_gradient(jnp.mean(
            out1["weights_sum"].astype(jnp.float32)))

    if ss.w_distortion > 0.0 and "weights" in out1:
        l_dist = ss.w_distortion * 0.5 * (
            distortion_loss(out1["weights"], out1["ts"], out1["dts"])
            + distortion_loss(out2["weights"], out2["ts"], out2["dts"]))
        loss = loss + l_dist
        aux["loss_distortion"] = l_dist

    if ss.w_opacity > 0.0 and "weights_sum" in out1:
        ws = jnp.concatenate([out1["weights_sum"], out2["weights_sum"]])
        ws = jnp.clip(ws, 0.0, 1.0)
        # ws^2 + (1-ws)^2 is in [0.5, 1] on [0, 1] — no epsilon needed;
        # the term is exactly 0 at ws in {0, 1} and log(2) at ws = 0.5
        l_op = ss.w_opacity * jnp.mean(
            -jnp.log(ws * ws + (1.0 - ws) * (1.0 - ws)))
        loss = loss + l_op
        aux["loss_opacity"] = l_op

    if not ss.event_only:
        lf, faux = frames_loss_fn(params, ss,
                                  {"rays_o": batch["rays_o"],
                                   "rays_d": batch["rays_d"],
                                   "images": batch["images"]}, kf, occ)
        loss = loss + ss.weight_loss_rgb * faux["loss_frames"]
        aux["loss_frames"] = faux["loss_frames"]

    if ss.negative_event_sampling and "rays_no_evs_o1" in batch:
        M = batch["rays_no_evs_o1"].shape[0]
        bg2 = jnp.broadcast_to(jax.random.uniform(k3, (1, C)), (M, C))
        if ss.use_march and ss.share_march and occ is not None:
            # the no-event pair's rays are as tightly correlated as the
            # event pair's — share one DDA march here too
            no1, no2 = _render_pair_shared(
                params, ss, batch["rays_no_evs_o1"], batch["rays_no_evs_d1"],
                batch["rays_no_evs_o2"], batch["rays_no_evs_d2"], bg2, k4, occ,
            )
        else:
            # independent perturb keys per view, like the event pair k1/k2
            no1 = _render(params, ss, batch["rays_no_evs_o1"], batch["rays_no_evs_d1"], bg2, k4, occ)
            no2 = _render(params, ss, batch["rays_no_evs_o2"], batch["rays_no_evs_d2"], bg2, k5, occ)
        nll1 = losses.log_intensity(no1["image"], ss.use_luma, True)
        nll2 = losses.log_intensity(no2["image"], ss.use_luma, True)
        lne = losses.no_event_loss(nll2 - nll1, ss.C_thres, ss.w_no_ev)
        loss = loss + lne
        aux["loss_no_evs"] = lne

    return loss, aux


def clip_loss_fn(params, ss, batch, rng, text_feat, side, occ=None):
    """Semantic guidance on a random-pose render (clip_utils.py role):
    render a side*side grid, embed, 1 - cos against the text feature.
    Differentiable through the whole render."""
    k_r = rng
    C = ss.out_dim_color
    out = _render(params, ss, batch["rays_o"], batch["rays_d"],
                  jnp.ones((1, C)), k_r, occ)
    img = out["image"].reshape(side, side, C)
    loss = 1.0 - jnp.sum(ss.clip_embedder(img) * text_feat)
    return loss, {"loss_clip": loss}


@functools.partial(jax.jit, static_argnames=("ss", "opt", "side"),
                   donate_argnums=(0,))
def train_step_clip(state, batch, rng, ss, opt, text_feat, side, occ=None):
    (loss, aux), grads = jax.value_and_grad(clip_loss_fn, has_aux=True)(
        state.params, ss, batch, rng, text_feat, side, occ
    )
    new_state = apply_updates(state, grads, opt)
    return new_state, {"loss": loss, "loss_clip": aux["loss_clip"]}


@functools.partial(jax.jit, static_argnames=("ss", "opt"), donate_argnums=(0,))
def train_step_frames(state, batch, rng, ss, opt, occ=None):
    (loss, aux), grads = jax.value_and_grad(frames_loss_fn, has_aux=True)(
        state.params, ss, batch, rng, occ
    )
    new_state = apply_updates(state, grads, opt)
    return new_state, {"loss": loss, "loss_frames": aux["loss_frames"],
                       "per_ray_loss": aux["per_ray_loss"]}


@functools.partial(jax.jit, static_argnames=("ss", "opt"), donate_argnums=(0,))
def train_step_events(state, batch, rng, ss, opt, occ=None):
    (loss, aux), grads = jax.value_and_grad(event_loss_fn, has_aux=True)(
        state.params, ss, batch, rng, occ
    )
    new_state = apply_updates(state, grads, opt)
    out = {"loss": loss, "loss_evs": aux["loss_evs"]}
    for k in aux:
        if k.startswith("implC_") or k in (
                "loss_frames", "loss_no_evs", "loss_opacity",
                "loss_distortion", "ws_mean"):
            out[k] = aux[k]
    return new_state, out
