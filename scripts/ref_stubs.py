"""Shared stub installer for importing the PyTorch reference on CPU.

The reference (/root/reference) imports CUDA extensions (raymarching,
gridencoder, shencoder, ...) and viz/metric packages absent from this
image.  This module stubs exactly what its Python-side code paths touch so
the pure-torch parts (renderer run(), encoders, event/pose/loss utilities,
the full Trainer train/eval loop) run on CPU.  Used by:
  - scripts/make_goldens.py   (golden-test freezing)
  - scripts/calibrate_baseline.py (baseline anchor measurement)
  - scripts/ab_reference.py   (head-to-head quality A/B training run)
Keep ONE copy so fixes reach all three.

Stub fidelity levels:
  - gridencoder.GridEncoder: FUNCTIONAL pure-torch reimplementation with
    the exact reference semantics (dense-until-overflow addressing,
    xor-prime spatial hash, uint32 wrap, oob zeros, U(-1e-4,1e-4) init) —
    ported from enerf_tpu/ops/hashgrid.py, which is oracle-tested against
    a scalar transliteration of gridencoder/src/gridencoder.cu:34-222
    (tests/test_ops.py, tests/test_golden.py).  Lets the reference train
    its REAL hashgrid backbone on CPU.
  - shencoder.SHEncoder: FUNCTIONAL pure-torch real-SH basis (degrees
    1..4), same constants as shencoder/src/shencoder.cu:28-124.
  - torch_ema.ExponentialMovingAverage: FUNCTIONAL, including the
    (1+n)/(10+n) num_updates decay ramp of the real torch_ema package
    (the reference evals through EMA weights — utils.py:890-900).
  - skimage.metrics.structural_similarity: FUNCTIONAL (scipy
    uniform_filter, skimage default 7x7 window / K1=.01 / K2=.03 /
    cov_norm NP/(NP-1)) for the 2D grayscale calls at utils.py:1110,1213.
  - raymarching.near_far_from_aabb: FUNCTIONAL CPU port (slab test).
  - lpips / tensorboardX / trimesh / mcubes / pyvista / dearpygui: inert
    no-ops (not on any training-math path).
"""

import os
import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


# -----------------------------------------------------------------------
# Functional torch reimplementations of the reference's CUDA extensions.
# -----------------------------------------------------------------------

# Hash primes: gridencoder/src/gridencoder.cu:41 (standard instant-ngp).
_PRIMES = (1, 2654435761, 805459861)
_U32 = 0xFFFFFFFF


def _make_grid_encoder(torch):
    import numpy as np
    nn = torch.nn

    class GridEncoder(nn.Module):
        """Pure-torch GridEncoder with reference semantics.

        Addressing parity target: gridencoder/src/gridencoder.cu:34-71
        (dense linear index while the level fits its table, else spatial
        hash x*1 ^ y*2654435761 ^ z*805459861, both mod table size, all in
        uint32 arithmetic).  Layout/init parity: gridencoder/grid.py:113-135
        (per-level size min(2^log2_hashmap_size, (res+1)^D) rounded up to a
        multiple of 8; flat table; U(-1e-4, 1e-4) init).  Forward parity:
        gridencoder.cu:74-222 (pos = x01*scale + 0.5, trilinear corner
        blend, out-of-[0,1] inputs produce zeros).  Backward is autograd
        (gather -> scatter-add), replacing the CUDA atomicAdd kernel.
        """

        def __init__(self, input_dim=3, num_levels=16, level_dim=2,
                     per_level_scale=2.0, base_resolution=16,
                     log2_hashmap_size=19, desired_resolution=2048,
                     gridtype="hash", align_corners=False):
            super().__init__()
            if desired_resolution is not None and num_levels > 1:
                per_level_scale = float(np.exp2(
                    np.log2(desired_resolution / base_resolution)
                    / (num_levels - 1)))
            D, L, C = input_dim, num_levels, level_dim
            self.input_dim, self.num_levels, self.level_dim = D, L, C
            self.per_level_scale = per_level_scale
            self.base_resolution = base_resolution
            self.log2_hashmap_size = log2_hashmap_size
            self.gridtype = gridtype
            self.output_dim = L * C

            S = np.log2(per_level_scale)
            max_params = 2 ** log2_hashmap_size
            scales, resolutions, sizes, offsets = [], [], [], [0]
            for lvl in range(L):
                scale = np.exp2(lvl * S) * base_resolution - 1.0
                res = int(np.ceil(scale)) + 1
                scales.append(scale)
                resolutions.append(res)
                n = min(max_params, (res + 1) ** D)
                n = int(np.ceil(n / 8) * 8)
                sizes.append(n)
                offsets.append(offsets[-1] + n)
            # dense strides + hash decision (gridencoder.cu:58-66)
            strides = np.ones((L, D), np.int64)
            use_dim = np.zeros((L, D), bool)
            for lvl in range(L):
                stride = 1
                for d in range(D):
                    if stride <= sizes[lvl]:
                        strides[lvl, d] = stride
                        use_dim[lvl, d] = True
                        stride *= resolutions[lvl] + 1
            final_stride = np.where(
                use_dim.all(axis=1),
                (np.asarray(resolutions) + 1).astype(np.int64) ** D,
                2 ** 62)
            is_hashed = (gridtype == "hash") & (final_stride > np.asarray(sizes))

            self.register_buffer("_scales", torch.tensor(scales, dtype=torch.float32))
            self.register_buffer("_strides", torch.tensor(
                (strides % (2 ** 32)) * use_dim, dtype=torch.int64))
            self.register_buffer("_sizes", torch.tensor(sizes, dtype=torch.int64))
            self.register_buffer("_offsets", torch.tensor(offsets[:-1], dtype=torch.int64))
            self.register_buffer("_is_hashed", torch.tensor(is_hashed, dtype=torch.bool))
            corners = torch.tensor(
                [[(c >> d) & 1 for d in range(D)] for c in range(2 ** D)],
                dtype=torch.int64)  # [2^D, D]
            self.register_buffer("_corners", corners)
            self.n_params = offsets[-1] * C  # grid.py:127 naming
            self.embeddings = nn.Parameter(
                torch.empty(offsets[-1], C).uniform_(-1e-4, 1e-4))

        def forward(self, inputs, bound=1):
            # grid.py:144: map [-bound, bound] -> [0, 1].  All 2^D corners
            # are evaluated in ONE vectorized pass (the per-corner python
            # loop was ~15x slower at training batch sizes).
            x01 = (inputs + bound) / (2 * bound)
            N = x01.shape[0]
            D, L, C = self.input_dim, self.num_levels, self.level_dim
            K = 2 ** D
            oob = ((x01 < 0.0) | (x01 > 1.0)).any(-1)  # [N]
            x = x01.clamp(0.0, 1.0).float()

            pos = x[:, None, :] * self._scales[None, :, None] + 0.5  # [N,L,D]
            pos_grid = torch.floor(pos)
            frac = pos - pos_grid                                    # [N,L,D]
            pos_grid = pos_grid.to(torch.int64)

            cb = self._corners                                       # [K,D]
            corner = pos_grid[:, :, None, :] + cb[None, None]        # [N,L,K,D]
            w = torch.where(cb[None, None].bool(),
                            frac[:, :, None, :],
                            1.0 - frac[:, :, None, :]).prod(-1)      # [N,L,K]
            # dense index with uint32 wrap (products < 2^43 fit int64;
            # one final mask == exact-sum mod 2^32 == CUDA wrap)
            dense = (corner * self._strides[None, :, None, :]).sum(-1) & _U32
            h = ((corner[..., 0] * _PRIMES[0]) & _U32)
            h = h ^ ((corner[..., 1] * _PRIMES[1]) & _U32)
            h = h ^ ((corner[..., 2] * _PRIMES[2]) & _U32)
            idx = torch.where(self._is_hashed[None, :, None], h, dense)
            idx = idx % self._sizes[None, :, None]
            flat = idx + self._offsets[None, :, None]                # [N,L,K]
            vals = self.embeddings[flat.reshape(-1)].reshape(N, L, K, C)
            out = (w.unsqueeze(-1).to(vals.dtype) * vals).sum(2)     # [N,L,C]

            out = torch.where(oob[:, None, None],
                              torch.zeros((), dtype=out.dtype), out)
            return out.reshape(N, L * C)

    return GridEncoder


def _make_sh_encoder(torch):
    nn = torch.nn

    class SHEncoder(nn.Module):
        """Pure-torch real-SH basis, degrees 1..4 (shencoder.cu:28-124
        constants; standard real-SH closed forms)."""

        def __init__(self, input_dim=3, degree=4):
            super().__init__()
            assert input_dim == 3 and 1 <= degree <= 4
            self.degree = degree
            self.output_dim = degree ** 2

        def forward(self, d, **kw):
            x, y, z = d[..., 0], d[..., 1], d[..., 2]
            out = [torch.full_like(x, 0.28209479177387814)]
            if self.degree >= 2:
                C1 = 0.48860251190291987
                out += [-C1 * y, C1 * z, -C1 * x]
            if self.degree >= 3:
                xy, yz, xz = x * y, y * z, x * z
                x2, y2, z2 = x * x, y * y, z * z
                out += [
                    1.0925484305920792 * xy,
                    -1.0925484305920792 * yz,
                    0.94617469575755997 * z2 - 0.31539156525251999,
                    -1.0925484305920792 * xz,
                    0.54627421529603959 * (x2 - y2),
                ]
            if self.degree >= 4:
                out += [
                    0.59004358992664352 * y * (-3.0 * x2 + y2),
                    2.8906114426405538 * xy * z,
                    0.45704579946446572 * y * (1.0 - 5.0 * z2),
                    0.3731763325901154 * z * (5.0 * z2 - 3.0),
                    0.45704579946446572 * x * (1.0 - 5.0 * z2),
                    1.4453057213202769 * z * (x2 - y2),
                    0.59004358992664352 * x * (-x2 + 3.0 * y2),
                ]
            return torch.stack(out, dim=-1)

    return SHEncoder


def _make_ema(torch):
    class ExponentialMovingAverage:
        """Functional torch_ema stand-in incl. the num_updates decay ramp
        min(decay, (1+n)/(10+n)) of the real package (the reference evals
        through EMA weights, utils.py:890-900)."""

        def __init__(self, parameters, decay=0.995, use_num_updates=True):
            self.decay = decay
            self.num_updates = 0 if use_num_updates else None
            self._params = [p for p in parameters if p.requires_grad]
            self.shadow_params = [p.detach().clone() for p in self._params]
            self.collected_params = None

        def update(self, parameters=None):
            params = self._params if parameters is None else list(parameters)
            decay = self.decay
            if self.num_updates is not None:
                self.num_updates += 1
                decay = min(decay,
                            (1 + self.num_updates) / (10 + self.num_updates))
            with torch.no_grad():
                for s, p in zip(self.shadow_params, params):
                    s.mul_(decay).add_(p.detach(), alpha=1.0 - decay)

        def store(self, parameters=None):
            params = self._params if parameters is None else list(parameters)
            self.collected_params = [p.detach().clone() for p in params]

        def copy_to(self, parameters=None):
            params = self._params if parameters is None else list(parameters)
            with torch.no_grad():
                for s, p in zip(self.shadow_params, params):
                    p.copy_(s)

        def restore(self, parameters=None):
            params = self._params if parameters is None else list(parameters)
            with torch.no_grad():
                for c, p in zip(self.collected_params, params):
                    p.copy_(c)

        # torch_ema checkpoint API (the reference persists EMA state,
        # utils.py:1315 / :1395)
        def state_dict(self):
            return {
                "decay": self.decay,
                "num_updates": self.num_updates,
                "shadow_params": self.shadow_params,
                "collected_params": self.collected_params,
            }

        def load_state_dict(self, sd):
            self.decay = sd["decay"]
            self.num_updates = sd["num_updates"]
            self.shadow_params = [t.clone() for t in sd["shadow_params"]]
            cp = sd.get("collected_params")
            self.collected_params = (
                None if cp is None else [t.clone() for t in cp])

    return ExponentialMovingAverage


def structural_similarity(im1, im2, data_range=1.0, win_size=7, K1=0.01,
                          K2=0.03):
    """skimage.metrics.structural_similarity for 2D float images with the
    defaults the reference uses (utils.py:1110,1213): uniform 7x7 window,
    sample-covariance normalization NP/(NP-1), crop of the filter pad."""
    import numpy as np
    from scipy.ndimage import uniform_filter

    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1.0)
    ux = uniform_filter(im1, win_size)
    uy = uniform_filter(im2, win_size)
    uxx = uniform_filter(im1 * im1, win_size)
    uyy = uniform_filter(im2 * im2, win_size)
    uxy = uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def _make_configargparse():
    """Functional configargparse stand-in for the reference CLI
    (main_nerf.py:97-187): an argparse.ArgumentParser whose
    `is_config_file=True` argument loads `key = value` lines (the
    reference's config txt format, e.g. configs/spiral1/spiral1_enerf.txt)
    as defaults, with command-line args taking precedence."""
    import argparse

    class ArgumentParser(argparse.ArgumentParser):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._config_dests = []

        def add_argument(self, *names, **kwargs):
            is_cfg = kwargs.pop("is_config_file", False)
            action = super().add_argument(*names, **kwargs)
            if is_cfg:
                self._config_dests.append(action)
            return action

        def _config_tokens(self, path, cli_argv):
            cli_keys = {t.split("=")[0] for t in cli_argv
                        if t.startswith("--")}
            tokens = []
            actions = {a.dest: a for a in self._actions}
            with open(path) as f:
                for line in f:
                    line = line.split("#")[0].strip()
                    if not line or "=" not in line:
                        continue
                    key, val = (s.strip() for s in line.split("=", 1))
                    if f"--{key}" in cli_keys or key not in actions:
                        continue  # CLI takes precedence
                    act = actions[key]
                    if isinstance(act, argparse._StoreTrueAction):
                        if val.lower() in ("true", "1"):
                            tokens.append(f"--{key}")
                    elif isinstance(act, argparse._AppendAction):
                        for item in val.strip("[]").split(","):
                            item = item.strip()
                            if item:
                                tokens += [f"--{key}", item]
                    else:
                        tokens += [f"--{key}", val]
            return tokens

        def parse_args(self, args=None, namespace=None):
            import sys as _sys
            argv = list(_sys.argv[1:] if args is None else args)
            pre = argparse.ArgumentParser(add_help=False)
            for act in self._config_dests:
                pre.add_argument(*act.option_strings, dest=act.dest)
            known, _ = pre.parse_known_args(argv)
            for act in self._config_dests:
                path = getattr(known, act.dest, None)
                if path and os.path.exists(path):
                    argv = self._config_tokens(path, argv) + argv
            return super().parse_args(argv, namespace)

    mod = types.ModuleType("configargparse")
    mod.ArgumentParser = ArgumentParser
    return mod


class _NoOp:
    """Inert object: every attribute is a swallow-everything callable."""

    def __init__(self, *a, **k):
        pass

    def __getattr__(self, name):
        return lambda *a, **k: None


def install_stubs():
    """Stub the CUDA extensions + absent viz/metric deps of the reference,
    then put the reference tree on sys.path."""
    import torch

    def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.05):
        # CPU port of raymarching.cu:94-158 (slab test, FLT_MAX miss,
        # min_near clamp) — vectorized but formula-identical.
        o, d = rays_o, rays_d
        inv = 1.0 / d
        # aabb layout is (xmin,ymin,zmin,xmax,ymax,zmax)
        lo = aabb[:3][None]
        hi = aabb[3:][None]
        tmin = (lo - o) * inv
        tmax = (hi - o) * inv
        near_d = torch.minimum(tmin, tmax)
        far_d = torch.maximum(tmin, tmax)
        near = near_d.max(dim=-1).values
        far = far_d.min(dim=-1).values
        miss = near > far
        fmax = torch.finfo(torch.float32).max
        near = torch.where(miss, torch.full_like(near, fmax), near)
        far = torch.where(miss, torch.full_like(far, fmax), far)
        near = torch.clamp(near, min=min_near)
        return near, far

    _stub("raymarching", near_far_from_aabb=near_far_from_aabb)
    if "configargparse" not in sys.modules:
        try:
            import configargparse  # noqa: F401
        except ImportError:
            sys.modules["configargparse"] = _make_configargparse()
    _stub("gridencoder", GridEncoder=_make_grid_encoder(torch))
    _stub("shencoder", SHEncoder=_make_sh_encoder(torch))
    _stub("trimesh")
    nb = _stub("numba")
    nb.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    nb.njit = nb.jit
    _stub("mcubes", marching_cubes=lambda *a, **k: (
        __import__("numpy").zeros((0, 3)), __import__("numpy").zeros((0, 3), dtype=int)))

    class _LPIPS:
        """Inert lpips.LPIPS: returns zeros shaped for the reference's
        `.numpy()[0][0][0][0]` indexing (utils.py:84-85)."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, a, b):
            return torch.zeros(1, 1, 1, 1)

    _stub("lpips", LPIPS=_LPIPS)
    _stub("tensorboardX", SummaryWriter=_NoOp)
    _stub("torch_ema", ExponentialMovingAverage=_make_ema(torch))
    _stub("pyvista", Spline=lambda *a, **k: _NoOp())
    sk = _stub("skimage")
    skm = _stub("skimage.metrics",
                structural_similarity=structural_similarity)
    sk.metrics = skm
    _stub("dearpygui")
    _stub("dearpygui.dearpygui")
    try:
        import pandas  # noqa: F401
    except ImportError:
        _stub("pandas")
    try:
        import matplotlib  # noqa: F401
        matplotlib.use("Agg")
    except ImportError:
        _stub("matplotlib")
        _stub("matplotlib.pyplot")
    sys.path.insert(0, REF)
