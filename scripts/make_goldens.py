"""Generate golden test vectors from the PyTorch reference at /root/reference.

Runs the reference's pure-torch/numpy code paths on CPU (the CUDA extension
modules are stubbed out; the stub provides a scalar-faithful CPU port of
near_far_from_aabb transcribed from raymarching.cu:94-158, the only L0
function the torch `run()` path touches) and freezes inputs + outputs (+
input-grads where torch autograd works on CPU) into tests/golden/*.npz.

Covered reference components:
  - encoding.py FreqEncoder (fwd + input grad)
  - activation.py trunc_exp (fwd + grad incl. the clamp region)
  - utils/event_utils.py rgb_to_luma (esim + 709), lin_log
  - nerf/utils.py solve_normal_equations (:44-71)
  - nerf/utils.py get_rays (:111-174) and get_event_rays (:185-216)
  - nerf/renderer.py run() (:150-278) end-to-end on an analytic field,
    incl. the PDF upsample path and a parameter gradient
  - nerf/utils.py Trainer.train_step_events loss math (:482-573) driven
    by preset rendered images through a fake-self harness
  - utils/pose_utils.py interpol_poses_slerp (:135-158)

Usage:  python scripts/make_goldens.py   (writes tests/golden/*.npz)
"""

import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


from ref_stubs import install_stubs  # shared reference stub installer


def gen_freq_encoder():
    import torch
    from encoding import FreqEncoder

    rng = np.random.RandomState(0)
    x = rng.uniform(-1.5, 1.5, (32, 3)).astype(np.float32)
    enc = FreqEncoder(input_dim=3, max_freq_log2=5, N_freqs=6)
    xt = torch.tensor(x, requires_grad=True)
    y = enc(xt)
    w = torch.tensor(rng.randn(*y.shape).astype(np.float32))
    (y * w).sum().backward()
    np.savez(
        os.path.join(OUT, "freq_encoder.npz"),
        x=x, y=y.detach().numpy(), w=w.numpy(), dx=xt.grad.numpy(),
        max_freq_log2=5, N_freqs=6,
    )
    print("freq_encoder:", y.shape)


def gen_trunc_exp():
    import torch
    from activation import trunc_exp

    x = np.array([-20.0, -15.0, -3.2, -1e-3, 0.0, 0.7, 14.999, 15.0, 18.5],
                 np.float32)
    xt = torch.tensor(x, requires_grad=True)
    y = trunc_exp(xt)
    y.sum().backward()
    np.savez(os.path.join(OUT, "trunc_exp.npz"),
             x=x, y=y.detach().numpy(), dx=xt.grad.numpy())
    print("trunc_exp ok")


def gen_event_utils():
    import torch
    from utils.event_utils import rgb_to_luma, lin_log

    rng = np.random.RandomState(1)
    rgb = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    luma_esim = rgb_to_luma(torch.tensor(rgb), esim=True).numpy()
    luma_709 = rgb_to_luma(torch.tensor(rgb), esim=False).numpy()
    vals = np.concatenate(
        [rng.uniform(0, 40, 48), [0.0, 19.999, 20.0, 20.001, 255.0]]
    ).astype(np.float32)[:, None]
    ll = lin_log(torch.tensor(vals), linlog_thres=20).numpy()
    np.savez(os.path.join(OUT, "event_utils.npz"),
             rgb=rgb, luma_esim=luma_esim, luma_709=luma_709,
             vals=vals, linlog=ll)
    print("event_utils ok")


def gen_normal_eq():
    import torch
    from nerf.utils import solve_normal_equations

    rng = np.random.RandomState(2)
    gt = rng.uniform(1.0, 5.0, (3, 8, 8, 1)).astype(np.float32)
    pred = (gt - 2.0) / 1.7 + rng.normal(0, 0.05, gt.shape).astype(np.float32)
    a, b = solve_normal_equations(torch.tensor(pred), torch.tensor(gt))
    np.savez(os.path.join(OUT, "normal_eq.npz"),
             pred=pred, gt=gt, a=np.float64(a), b=np.float64(b))
    print(f"normal_eq: a={a:.4f} b={b:.4f}")


def _rot_from_axis_angle(axis, ang):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def gen_rays():
    import torch
    from nerf.utils import get_rays, get_event_rays

    H, W = 6, 9
    intr = np.array([80.0, 82.0, 4.2, 2.9], np.float32)  # fx fy cx cy
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = _rot_from_axis_angle([0.3, 1.0, 0.2], 0.7).astype(np.float32)
    pose[:3, 3] = [0.4, -0.2, 1.1]
    res = get_rays(torch.tensor(pose)[None], intr, H, W, N=-1)

    # event rays: 16 events, paired poses
    rng = np.random.RandomState(3)
    NE = 16
    xs = rng.randint(0, W, NE).astype(np.float32)
    ys = rng.randint(0, H, NE).astype(np.float32)
    p1 = np.stack([pose[:3, :4]] * NE)  # [NE, 3, 4]
    p2 = p1.copy()
    p2[:, :, 3] += rng.normal(0, 0.01, (NE, 3))
    ev = get_event_rays(
        torch.tensor(xs), torch.tensor(ys),
        torch.tensor(p1[None]), torch.tensor(p2[None]), intr,
    )
    np.savez(
        os.path.join(OUT, "rays.npz"),
        H=H, W=W, intrinsics=intr, pose=pose,
        rays_o=res["rays_o"].numpy(), rays_d=res["rays_d"].numpy(),
        xs=xs, ys=ys, p1=p1, p2=p2,
        evs_o1=ev["rays_evs_o1"].numpy(), evs_d1=ev["rays_evs_d1"].numpy(),
        evs_o2=ev["rays_evs_o2"].numpy(), evs_d2=ev["rays_evs_d2"].numpy(),
    )
    print("rays ok")


# analytic field used for the renderer golden (duplicated in JAX on the
# test side; any renderer-math divergence shows up as image mismatch)
def _analytic_sigma_np(x, s):
    r2 = (x ** 2).sum(-1)
    return s * 3.0 * np.exp(-4.0 * r2) * (1.5 + np.sin(5.0 * x[..., 0]))


_WG = np.array([[0.9, -0.4, 0.1], [0.2, 0.8, -0.5], [-0.6, 0.3, 0.7]], np.float32)
_WD = np.array([[0.5, 0.1, -0.2], [-0.3, 0.6, 0.4], [0.2, -0.1, 0.8]], np.float32)


def gen_run_renderer():
    import torch
    from nerf.renderer import NeRFRenderer

    class AnalyticModel(NeRFRenderer):
        def __init__(self, s):
            super().__init__(bound=1.3, cuda_ray=False, density_scale=1.3,
                             min_near=0.2, bg_radius=-1)
            self.s = s

        def density(self, x):
            r2 = (x ** 2).sum(-1)
            sigma = self.s * 3.0 * torch.exp(-4.0 * r2) * (
                1.5 + torch.sin(5.0 * x[..., 0]))
            return {"sigma": sigma, "geo_feat": x}

        def color(self, x, d, mask=None, geo_feat=None, **kw):
            wg = torch.tensor(_WG)
            wd = torch.tensor(_WD)
            return torch.sigmoid(geo_feat @ wg + d @ wd)

    s = torch.tensor(1.0, requires_grad=True)
    model = AnalyticModel(s)
    model.eval()  # self.training=False -> det pdf sampling, aabb_infer

    rng = np.random.RandomState(4)
    N = 24
    o = np.tile(np.array([[0.1, -0.05, -2.2]], np.float32), (N, 1))
    # aim every ray at a point inside the box (miss rays get FLT_MAX
    # nears/fars in the reference, which NaN the torch grads on CPU)
    targets = rng.uniform(-0.8, 0.8, (N, 3)).astype(np.float32)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ot = torch.tensor(o)[None]
    dt = torch.tensor(d)[None]

    for tag, ups in (("noups", 0), ("ups", 16)):
        out = model.run(ot, dt, num_steps=32, upsample_steps=ups,
                        bg_color=0.7, perturb=False, out_dim_color=3)
        img = out["image"]
        loss = img.sum() + out["depth"].sum()
        gs = torch.autograd.grad(loss, s, retain_graph=False)[0]
        s.grad = None
        np.savez(
            os.path.join(OUT, f"run_renderer_{tag}.npz"),
            rays_o=o, rays_d=d, num_steps=32, upsample_steps=ups,
            bound=1.3, density_scale=1.3, min_near=0.2, bg=0.7,
            wg=_WG, wd=_WD,
            image=img.detach().numpy()[0], depth=out["depth"].detach().numpy()[0],
            grad_s=gs.detach().numpy(),
        )
        print(f"run_renderer_{tag}: img mean {float(img.mean()):.5f} "
              f"grad_s {float(gs):.5f}")


def gen_event_loss():
    """Drive Trainer.train_step_events (utils.py:482-573) with preset
    rendered images via a fake-self harness; freeze all loss outputs."""
    import torch
    from nerf.utils import Trainer

    rng = np.random.RandomState(5)
    NE = 64
    img1 = rng.uniform(0.02, 1.0, (1, NE, 1)).astype(np.float32)
    img2 = (img1 + rng.normal(0, 0.15, img1.shape)).clip(1e-3, 1.0).astype(np.float32)
    pols = rng.choice([-1.0, 1.0], (1, NE)).astype(np.float32)
    frames = rng.uniform(0, 1, (1, 32, 1)).astype(np.float32)
    frames_pred = rng.uniform(0, 1, (1, 32, 1)).astype(np.float32)
    no1 = rng.uniform(0.02, 1.0, (1, NE, 1)).astype(np.float32)
    no2 = (no1 + rng.normal(0, 0.3, no1.shape)).clip(1e-3, 1.0).astype(np.float32)

    class FakeModel:
        def __init__(self, outputs):
            self.outputs = [torch.tensor(x) for x in outputs]
            self.i = 0

        def render(self, *a, **k):
            out = {"image": self.outputs[self.i]}
            self.i += 1
            return out

    def run_case(C_thres, event_only, negative):
        outs = [img1, img2]
        if not event_only:
            outs.append(frames_pred)
        if negative:
            outs += [no1, no2]
        fake = types.SimpleNamespace(
            out_dim_color=1, device="cpu", model=FakeModel(outs),
            use_luma=False, linlog=True, log_thres=torch.tensor(1e-5),
            log_implicit_C_thres=False, C_thres=C_thres,
            event_only=event_only, criterion=torch.nn.MSELoss(reduction="none"),
            weight_loss_rgb=1.0, negative_event_sampling=negative,
            epoch=3, epoch_start_noEvLoss=0, w_no_ev=0.7,
            opt=types.SimpleNamespace(),
        )
        data = {
            "images": torch.tensor(frames),
            "rays_evs_o1": None, "rays_evs_d1": None,
            "rays_evs_o2": None, "rays_evs_d2": None,
            "rays_o": None, "rays_d": None,
            "rays_no_evs_o1": None, "rays_no_evs_d1": None,
            "rays_no_evs_o2": None, "rays_no_evs_d2": None,
            "pols": torch.tensor(pols),
        }
        delta, gt_pol, loss, _, losses = Trainer.train_step_events(fake, data)
        return {
            "delta_linlog": delta.numpy(),
            "loss": float(loss),
            "loss_evs": float(losses["loss_evs"]),
            "loss_no_evs": float(losses["loss_no_evs"])
            if torch.is_tensor(losses["loss_no_evs"]) else -1.0,
            "loss_frames": float(losses["loss_frames"])
            if torch.is_tensor(losses["loss_frames"]) else -1.0,
        }

    cases = {
        "cthres": run_case(0.2, True, False),
        "norm": run_case(-1.0, True, False),
        "norm_rgb": run_case(-1.0, False, False),
        "cthres_noev": run_case(0.2, True, True),
    }
    flat = {"img1": img1, "img2": img2, "pols": pols, "frames": frames,
            "frames_pred": frames_pred, "no1": no1, "no2": no2}
    for name, c in cases.items():
        for k, v in c.items():
            flat[f"{name}_{k}"] = v
    np.savez(os.path.join(OUT, "event_loss.npz"), **flat)
    print("event_loss:", {k: round(v['loss'], 5) for k, v in cases.items()})


def gen_slerp():
    from utils.pose_utils import interpol_poses_slerp

    rng = np.random.RandomState(6)
    T = 8
    tss = np.linspace(0.0, 1.0, T)
    rots = np.stack([
        _rot_from_axis_angle(rng.normal(size=3), 0.2 * i) for i in range(T)
    ])
    trans = rng.normal(size=(T, 3))
    tq = np.sort(rng.uniform(0.0, 1.0, 20))
    r_out, t_out = interpol_poses_slerp(tss, rots, trans, tq)
    np.savez(os.path.join(OUT, "slerp.npz"),
             tss=tss, rots=rots, trans=trans, tq=tq,
             rots_out=r_out, trans_out=t_out)
    print("slerp ok")


def gen_network():
    """Freeze the COMPOSED reference NeRFNetwork (nerf/network.py:104-214):
    hashgrid encoder -> sigma MLP -> trunc_exp + geo_feat -> SH dir encode
    -> color MLP -> sigmoid, forward + parameter gradients.  The hashgrid
    backbone runs through the functional pure-torch GridEncoder stub
    (ref_stubs.py), which is numerically identical to the CUDA kernel's
    semantics (itself oracle-tested in tests/test_ops.py)."""
    import torch
    import encoding as ref_encoding
    import nerf.network as ref_network
    from nerf.network import NeRFNetwork

    # Shrink the grid CONFIG (not the code path) so the frozen table fits
    # in-repo: 2^14-entry levels to resolution 256 instead of 2^19 to 2048.
    # Addressing across sizes is oracle-tested separately (tests/test_ops).
    GRID_KW = dict(num_levels=16, level_dim=2, base_resolution=16,
                   log2_hashmap_size=14)

    def small_get_encoder(enc, **kw):
        if enc == "hashgrid":
            kw = {**kw, **GRID_KW, "desired_resolution": 256}
        return ref_encoding.get_encoder(enc, **kw)

    ref_network.get_encoder = small_get_encoder
    try:
        torch.manual_seed(0)
        model = NeRFNetwork(
            encoding="hashgrid", bound=1.0, cuda_ray=False, density_scale=1,
            min_near=0.2, density_thresh=0.01, bg_radius=-1,
            disable_view_direction=False, out_dim_color=1,
        )
    finally:
        ref_network.get_encoder = ref_encoding.get_encoder
    rng = np.random.RandomState(11)
    # positions span in/out of [-bound, bound] to hit the oob-zeros path
    x = rng.uniform(-1.2, 1.2, (256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    sigma, color = model(torch.from_numpy(x), torch.from_numpy(d))
    ws = torch.tensor(rng.randn(*sigma.shape).astype(np.float32))
    wc = torch.tensor(rng.randn(*color.shape).astype(np.float32))
    loss = (sigma * ws).mean() + (color * wc).mean()
    loss.backward()

    out = {
        "x": x, "d": d,
        "sigma": sigma.detach().numpy(), "color": color.detach().numpy(),
        "ws": ws.numpy(), "wc": wc.numpy(),
        "embeddings": model.encoder.embeddings.detach().numpy(),
        "d_embeddings": model.encoder.embeddings.grad.numpy(),
    }
    for i, lin in enumerate(model.sigma_net):
        out[f"sigma_w{i}"] = lin.weight.detach().numpy()  # [out, in]
        out[f"d_sigma_w{i}"] = lin.weight.grad.numpy()
    for i, lin in enumerate(model.color_net):
        out[f"color_w{i}"] = lin.weight.detach().numpy()
        out[f"d_color_w{i}"] = lin.weight.grad.numpy()
    np.savez(os.path.join(OUT, "network.npz"), **out)
    print("network:", sigma.shape, color.shape,
          "emb", out["embeddings"].shape)


def main():
    os.makedirs(OUT, exist_ok=True)
    install_stubs()
    gen_freq_encoder()
    gen_trunc_exp()
    gen_event_utils()
    gen_normal_eq()
    gen_rays()
    gen_run_renderer()
    gen_event_loss()
    gen_slerp()
    gen_network()
    print("goldens written to", OUT)


if __name__ == "__main__":
    main()
