"""Loss functions: event photometric losses + frame losses.

Parity:
  - utils/event_utils.py:23-52 rgb_to_luma (BT.601 'esim' / BT.709 coeffs)
  - utils/event_utils.py:54-66 lin_log (linear below thres, ln above)
  - nerf/utils.py:509-567 train_step_events loss math: C_thres squared loss,
    normalized (C_thres == -1) loss with x20 (x400 combined) weights,
    no-event hinge loss relu(|dL| - C)
  - loss.py:5-23 mape/huber; main_nerf.py:191 MSE criterion
  - utils/event_utils.py:69-107 implicit-C estimation (diagnostics)
"""

import jax.numpy as jnp

LUMA_ESIM = (0.299, 0.587, 0.114)  # BT.601, rpg_esim convention
LUMA_709 = (0.2126, 0.7152, 0.0722)


def rgb_to_luma(rgb, esim=True):
    """[..., 3] -> [..., 1] luma."""
    r, g, b = LUMA_ESIM if esim else LUMA_709
    f = jnp.asarray([r, g, b], rgb.dtype)
    return jnp.sum(rgb * f, axis=-1, keepdims=True)


def lin_log(color, linlog_thres=20.0):
    """Linear below `linlog_thres`, natural log above (continuous)."""
    lin_slope = jnp.log(linlog_thres) / linlog_thres
    return jnp.where(color < linlog_thres, lin_slope * color, jnp.log(jnp.maximum(color, 1e-20)))


def log_intensity(image01, use_luma, linlog=True, log_thres=1e-5):
    """Render [.., C] in [0,1] -> log-intensity [.., 1 or C].

    Mirrors utils.py:491-507: optional luma conversion, intensities scaled
    to [0, 255], then lin_log (or plain clamped log).
    """
    x = rgb_to_luma(image01, esim=True) if use_luma else image01
    x = x * 255.0
    if linlog:
        return lin_log(x, 20.0)
    return jnp.log(jnp.maximum(x, log_thres))


def event_loss(delta_linlog, pol, C_thres, event_only=True):
    """Core event supervision (utils.py:517-528).

    delta_linlog: [B, N, 1or3] log-intensity difference between the renders
      at the paired poses.
    pol: [B, N, 1] summed polarity.
    C_thres: contrast threshold; -1 selects the normalized loss.
    """
    if C_thres != -1:
        return jnp.mean((delta_linlog - pol * C_thres) ** 2)
    EPS = 1e-9
    w = 20.0 if event_only else 400.0
    dn = delta_linlog / (jnp.linalg.norm(delta_linlog, axis=1, keepdims=True) + EPS)
    pn = pol / (jnp.linalg.norm(pol, axis=1, keepdims=True) + EPS)
    return w * jnp.mean((dn - pn) ** 2)


def no_event_loss(delta_linlog, C_thres, w_no_ev=1.0):
    """Hinge loss on no-event pixels (utils.py:564-566)."""
    Cno = C_thres if C_thres > 0 else 0.25
    return w_no_ev * jnp.mean(jnp.maximum(jnp.abs(delta_linlog) - Cno, 0.0))


def estimate_implicit_C(pol, delta_linlog):
    """Median implicit contrast thresholds (diagnostics, event_utils.py:69-107)."""
    d = delta_linlog.reshape(-1)
    p = pol.reshape(-1)
    ratio = d / jnp.where(p == 0, 1.0, p)
    pos = p > 0
    neg = p < 0
    def masked_median(x, m):
        big = jnp.where(m, x, jnp.nan)
        return jnp.nanmedian(big)
    return {
        "median_on": masked_median(ratio, pos),
        "median_off": masked_median(ratio, neg),
        "median_on_sign": masked_median(ratio, pos & (d >= 0)),
        "median_off_sign": masked_median(ratio, neg & (d <= 0)),
    }


def mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def mape_loss(pred, target):
    diff = jnp.abs(pred - target)
    return jnp.mean(diff / (jnp.abs(target) + 1e-2))


def huber_loss(pred, target, delta=0.1):
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    return jnp.mean(jnp.where(rel > delta, rel - 0.5 * delta, sqr))
