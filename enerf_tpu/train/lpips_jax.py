"""Self-contained JAX LPIPS (perceptual distance).

Parity target: reference nerf/utils.py:40-41, 1096-1112 computes
`lpips.LPIPS(net='alex')` and `net='vgg'` per validation image.  This image
has no lpips package and no pretrained weights (zero egress), so this
module implements the LPIPS computation graph (Zhang et al., CVPR 2018:
unit-normalize deep features per channel, squared difference, spatial mean,
channel-weighted sum across layers) over AlexNet- and VGG16-style
convolutional stacks in pure JAX with FIXED seeded random weights.

Why random weights are a legitimate fallback: Zhang et al. Table 5 reports
2AFC scores of ~82.4% for a randomly initialized AlexNet vs 69.8% for
pixel-space L2 and ~83% for the trained/calibrated nets — the metric's
power comes mostly from the multi-scale rectified-conv architecture, not
the ImageNet weights.  Scores from this module are comparable BETWEEN runs
of this framework (fixed seed => fixed metric) but NOT numerically
comparable to torch-lpips values; eval logs label them `lpips_*_rand`.

If real calibration weights become available, drop an .npz at
$ENERF_LPIPS_WEIGHTS with arrays `{net}_conv{i}_w`, `{net}_conv{i}_b`,
`{net}_lin{i}` and they are used instead (then labels lose the suffix).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp


# (out_ch, kernel, stride, pool_before) per conv layer; features are taken
# after each layer's ReLU (alex: 5 taps, vgg16: 5 taps at block ends)
_ALEX = [
    (64, 11, 4, False),
    (192, 5, 1, True),
    (384, 3, 1, True),
    (256, 3, 1, False),
    (256, 3, 1, False),
]
_VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# ImageNet normalization the torch LPIPS applies to [-1, 1] inputs
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _he_conv(key, k, cin, cout):
    std = np.sqrt(2.0 / (k * k * cin))
    return std * jax.random.normal(key, (k, k, cin, cout), jnp.float32)


def _init_alex(key):
    params = []
    cin = 3
    for i, (cout, k, _, _) in enumerate(_ALEX):
        key, kk = jax.random.split(key)
        params.append((_he_conv(kk, k, cin, cout), jnp.zeros((cout,))))
        cin = cout
    return params


def _init_vgg(key):
    params = []
    cin = 3
    for cout, reps in _VGG_BLOCKS:
        for _ in range(reps):
            key, kk = jax.random.split(key)
            params.append((_he_conv(kk, 3, cin, cout), jnp.zeros((cout,))))
            cin = cout
    return params


def _conv(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + b)


def _maxpool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _alex_feats(params, x):
    feats = []
    for (w, b), (_, _, stride, pool) in zip(params, _ALEX):
        if pool:
            x = _maxpool(x)
        x = _conv(x, w, b, stride)
        feats.append(x)
    return feats


def _vgg_feats(params, x):
    feats = []
    i = 0
    for bi, (cout, reps) in enumerate(_VGG_BLOCKS):
        if bi > 0:
            x = _maxpool(x)
        for _ in range(reps):
            w, b = params[i]
            x = _conv(x, w, b, 1)
            i += 1
        feats.append(x)
    return feats


def _unit_normalize(f):
    return f / jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)


def _load_external(net, n_layers):
    path = os.environ.get("ENERF_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    z = np.load(path)
    try:
        convs = [(jnp.asarray(z[f"{net}_conv{i}_w"]), jnp.asarray(z[f"{net}_conv{i}_b"]))
                 for i in range(n_layers)]
        lins = [jnp.asarray(z[f"{net}_lin{i}"]) for i in range(len(_ALEX if net == "alex" else _VGG_BLOCKS))]
        return convs, lins
    except KeyError:
        return None


@functools.lru_cache(maxsize=2)
def _get_net(net):
    """Returns (params, lin_weights_or_None, calibrated: bool)."""
    n_layers = len(_ALEX) if net == "alex" else sum(r for _, r in _VGG_BLOCKS)
    ext = _load_external(net, n_layers)
    if ext is not None:
        return ext[0], ext[1], True
    key = jax.random.PRNGKey(0 if net == "alex" else 1)
    params = _init_alex(key) if net == "alex" else _init_vgg(key)
    return params, None, False


def lpips_is_calibrated():
    """True when external (trained) weights are in use."""
    return _get_net("alex")[2]


@functools.partial(jax.jit, static_argnames=("net",))
def _lpips_pair(params_flat, img0, img1, net):
    params = params_flat
    x0 = (2.0 * img0 - 1.0 - _SHIFT) / _SCALE
    x1 = (2.0 * img1 - 1.0 - _SHIFT) / _SCALE
    f = _alex_feats if net == "alex" else _vgg_feats
    d = jnp.float32(0.0)
    for f0, f1 in zip(f(params, x0[None]), f(params, x1[None])):
        n0, n1 = _unit_normalize(f0), _unit_normalize(f1)
        # uncalibrated: mean over channels (lin weights = 1/C)
        d = d + jnp.mean((n0 - n1) ** 2)
    return d


def lpips_distance(img0, img1, net="alex"):
    """Perceptual distance between two [H, W, C] images in [0, 1].

    Grayscale inputs are replicated to 3 channels (the reference passes
    grayscale event renders through RGB LPIPS the same way).
    """
    def prep(x):
        x = jnp.asarray(x, jnp.float32)
        if x.ndim == 2:
            x = x[..., None]
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        return x

    params, lins, _ = _get_net(net)
    if lins is not None:
        # calibrated path: per-layer 1x1 conv weights
        x0 = (2.0 * prep(img0) - 1.0 - _SHIFT) / _SCALE
        x1 = (2.0 * prep(img1) - 1.0 - _SHIFT) / _SCALE
        f = _alex_feats if net == "alex" else _vgg_feats
        d = 0.0
        for w, f0, f1 in zip(lins, f(params, x0[None]), f(params, x1[None])):
            n0, n1 = _unit_normalize(f0), _unit_normalize(f1)
            d = d + float(jnp.mean(jnp.sum(((n0 - n1) ** 2) * w, axis=-1)))
        return float(d)
    return float(_lpips_pair(tuple(params), prep(img0), prep(img1), net))
