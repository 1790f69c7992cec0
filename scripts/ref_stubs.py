"""Shared stub installer for importing the PyTorch reference on CPU.

The reference (/root/reference) imports CUDA extensions (raymarching,
gridencoder, ...) and viz/metric packages absent from this image.  This
module stubs exactly what its Python-side code paths touch so the
pure-torch parts (renderer run(), encoders, event/pose/loss utilities)
run on CPU.  Used by scripts/make_goldens.py (golden-test freezing) and
scripts/calibrate_baseline.py (baseline anchor measurement) — keep ONE
copy so fixes (e.g. dearpygui, matplotlib Agg) reach both.
"""

import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


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
    _stub("trimesh")
    nb = _stub("numba")
    nb.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    nb.njit = nb.jit
    _stub("mcubes")

    class _LPIPS:
        def __init__(self, *a, **k):
            pass

    _stub("lpips", LPIPS=_LPIPS)
    _stub("tensorboardX", SummaryWriter=object)

    class _EMA:
        def __init__(self, *a, **k):
            pass

    _stub("torch_ema", ExponentialMovingAverage=_EMA)
    _stub("pyvista")
    sk = _stub("skimage")
    skm = _stub("skimage.metrics", structural_similarity=lambda *a, **k: 0.0)
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
