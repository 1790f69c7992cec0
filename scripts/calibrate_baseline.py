"""Calibrate the reference-throughput anchor used by bench.py.

The reference publishes no benchmark numbers (BASELINE.md).  This script
derives an anchor for its event-training throughput on its tested RTX A4000
by two independent routes and records both:

(1) CPU measurement of the reference's own code: the pure-torch render path
    `NeRFRenderer.run()` (nerf/renderer.py:150-278, the path every enerf
    config uses — cuda_ray=False) driving a NeRFNetwork-shaped model, event
    step = 2 renders + event loss + backward + Adam, at the spiral1_enerf
    config scale (30096 rays x 512 samples).  The CUDA hash encoder cannot
    run on CPU, so the reference's own pure-torch FreqEncoder
    (encoding.py:5-43, get_encoder('frequency')) stands in at matched
    output width; everything else is reference code.  The A4000 number is
    then bounded by scaling with a GENEROUS CPU->A4000 factor.

(2) Roofline bound from first principles at the same config: HBM traffic of
    the hash gathers + activation tensors and fp16 tensor-core FLOPs of the
    MLPs on A4000 (448 GB/s, ~76 TFLOPS fp16) — an upper bound the real
    eager-torch implementation cannot exceed.

The HEADLINE anchor written to BASELINE_CALIBRATION.json is the REALISTIC
EAGER-TORCH ESTIMATE (eager_torch_a4000_estimate): eager run() materializes
~200 f32 intermediates per sample point (read+write) plus 256 B/pt of hash-
encode DRAM traffic; backward ~ 2x forward; two renders per event step; at
A4000's 448 GB/s.  It sits BETWEEN the two brackets above — the scaled-CPU
measurement (lower bound) and the ideal-kernel roofline (upper bound) —
and all three are recorded for transparency.  Units: RAY-RENDERS per
second, counting each of the event pair's two renders — the same
convention bench.py uses (this fixes the round-1 inconsistency where the
estimate counted pairs but the bench counted renders).
"""

import json
import os
import sys
import time
import types


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_stubs import install_stubs  # shared reference stub installer


def measure_cpu(n_rays=30096, num_steps=512, iters=3):
    """Reference event step (2x run() + loss + backward + Adam) on CPU."""
    import torch
    from nerf.renderer import NeRFRenderer
    from encoding import get_encoder
    from activation import trunc_exp
    from utils.event_utils import lin_log

    class RefShapeModel(NeRFRenderer):
        """NeRFNetwork topology (nerf/network.py:32-77) on the reference's
        pure-torch FreqEncoder (CUDA hash encoder cannot run on CPU)."""

        def __init__(self):
            super().__init__(bound=3.0, cuda_ray=False, density_scale=1,
                             min_near=0.2, bg_radius=-1)
            self.encoder, enc_dim = get_encoder("frequency", multires=6)
            self.encoder_dir, dir_dim = get_encoder("frequency", multires=4)
            self.sigma_net = torch.nn.Sequential(
                torch.nn.Linear(enc_dim, 64, bias=False), torch.nn.ReLU(),
                torch.nn.Linear(64, 16, bias=False),
            )
            self.color_net = torch.nn.Sequential(
                torch.nn.Linear(dir_dim + 15, 64, bias=False), torch.nn.ReLU(),
                torch.nn.Linear(64, 64, bias=False), torch.nn.ReLU(),
                torch.nn.Linear(64, 1, bias=False),
            )

        def density(self, x):
            h = self.sigma_net(self.encoder(x, bound=self.bound))
            return {"sigma": trunc_exp(h[..., 0]), "geo_feat": h[..., 1:]}

        def color(self, x, d, mask=None, geo_feat=None, **kw):
            h = torch.cat([self.encoder_dir(d), geo_feat], -1)
            return torch.sigmoid(self.color_net(h))

    torch.set_num_threads(os.cpu_count())
    model = RefShapeModel()
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=5e-3, betas=(0.9, 0.99),
                           eps=1e-15)

    g = torch.Generator().manual_seed(0)
    tgt = torch.rand(n_rays, 3, generator=g) * 1.2 - 0.6
    o = torch.tensor([[0.1, 0.0, -2.0]]).expand(n_rays, 3)
    d = tgt - o
    d = d / d.norm(dim=-1, keepdim=True)
    o1, d1 = o[None], d[None]
    o2, d2 = (o + 0.01)[None], d[None]
    pols = torch.randint(0, 2, (1, n_rays), generator=g).float() * 2 - 1

    def step():
        bg = torch.rand(1, 1, 1)
        out1 = model.run(o1, d1, num_steps=num_steps, upsample_steps=0,
                         bg_color=bg, perturb=True, out_dim_color=1)
        out2 = model.run(o2, d2, num_steps=num_steps, upsample_steps=0,
                         bg_color=bg, perturb=True, out_dim_color=1)
        ll1 = lin_log(out1["image"] * 255, 20)
        ll2 = lin_log(out2["image"] * 255, 20)
        loss = torch.mean((ll2 - ll1 - pols[..., None] * 0.2) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    ray_renders_s = 2 * n_rays / dt
    return dt, ray_renders_s


def roofline_a4000(n_rays=30096, num_steps=512):
    """Upper bound for the reference event step on A4000 at config scale."""
    pts = n_rays * num_steps  # per render
    # hash encode: 16 levels x 8 corners x 4B fp16x2 random reads; assume
    # HALF hit in L2 (generous) -> 256 B/pt DRAM. Backward scatter ~same.
    enc_bytes = pts * 16 * 8 * 4 * 0.5
    # eager-torch activation traffic (xyzs, sigmas, geo_feat, dirs, sh, rgb,
    # weights, intermediates; fp16): ~40 floats/pt read+write -> 160 B/pt
    act_bytes = pts * 160
    bw = 448e9  # A4000 HBM
    t_mem_fwd = (enc_bytes + act_bytes) / bw
    # MLP flops: ~20k flops/pt fwd
    t_flops_fwd = pts * 20e3 / 76e12
    t_fwd = max(t_mem_fwd, t_flops_fwd)
    # event step: 2 renders fwd + backward ~2x both + opt overhead 10%
    t_step = (2 * t_fwd) * 3 * 1.1
    return 2 * n_rays / t_step


def eager_torch_a4000_estimate(n_rays=30096, num_steps=512):
    """Realistic eager-torch estimate for the reference event step on A4000
    (the HEADLINE anchor): eager run() materializes ~200 f32 intermediates
    per point read+write (1600 B/pt) + 256 B/pt encode DRAM; backward ~ 2x
    forward; 2 renders per step -> t_step = 6 * t_fwd at 448 GB/s."""
    pts = n_rays * num_steps
    bytes_per_pt = 200 * 4 * 2 + 256
    t_fwd = pts * bytes_per_pt / 448e9
    t_step = 6.0 * t_fwd
    return 2 * n_rays / t_step


def main():
    install_stubs()
    n_rays = 30096
    cpu_rays = n_rays // 4  # quarter batch: per-ray CPU cost is flat
    print(f"measuring reference event step on CPU ({cpu_rays} rays x 512)...")
    dt, cpu_rate = measure_cpu(n_rays=cpu_rays)
    print(f"  cpu: {dt*1e3:.0f} ms/step -> {cpu_rate:.0f} ray-renders/s")
    # generous CPU->A4000 factor for this workload mix (bandwidth 448/~60
    # GB/s ~ 7.5x, fp16 tensor flops ~50x vs avx512 ~1.5TF; memory-bound
    # mix -> use 40x, far above the bandwidth ratio, to favor the reference)
    cpu_to_a4000 = 40.0
    anchor_scaled = cpu_rate * cpu_to_a4000
    anchor_roofline = roofline_a4000(n_rays=n_rays)
    anchor_eager = eager_torch_a4000_estimate(n_rays=n_rays)
    print(f"  scaled(cpu x {cpu_to_a4000:.0f}) lower bound: {anchor_scaled:.0f}")
    print(f"  eager-torch estimate (HEADLINE anchor):  {anchor_eager:.0f}")
    print(f"  ideal-kernel roofline upper bound:       {anchor_roofline:.0f}")
    assert anchor_scaled <= anchor_eager <= anchor_roofline, (
        "anchor must sit between its brackets")
    out = {
        "anchor_ray_renders_per_s_fwd_bwd": round(anchor_eager),
        "cpu_measured_ray_renders_per_s": round(cpu_rate),
        "cpu_ms_per_step_quarter_batch": round(dt * 1e3),
        "cpu_rays_per_step": cpu_rays,
        "cpu_to_a4000_factor": cpu_to_a4000,
        "roofline_bound_ray_renders_per_s": round(anchor_roofline),
        "config": "spiral1_enerf scale: 512 samples/ray, event step (2 "
                  "renders + loss + bwd + Adam); CPU measured at quarter "
                  "ray batch (per-ray cost flat)",
        "note": "reference publishes no numbers; anchor = realistic "
                "eager-torch A4000 estimate for the reference's own torch "
                "run() path (FreqEncoder stand-in for the CUDA-only hash "
                "encoder), bracketed by the scaled CPU measurement (lower) "
                "and the ideal-kernel roofline (upper). Units: "
                "ray-renders/s, both renders of each event pair counted.",
        "eager_torch_a4000_estimate_ray_renders_per_s": round(anchor_eager),
        "eager_model": "~200 f32 materialized intermediates/pt read+write "
                       "in eager run() + 256 B/pt encode DRAM, x2 renders, "
                       "bwd ~ 2x fwd, 448 GB/s A4000 HBM",
        "anchor_rationale": "headline anchor = realistic eager-torch "
                            "estimate (between the scaled CPU measurement "
                            "lower bound and the ideal-kernel roofline "
                            "upper bound); all three recorded for "
                            "transparency",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_CALIBRATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
