"""Train state: params + Adam + LR schedule + EMA as one explicit pytree.

Parity: reference main_nerf.py:211-212 — Adam(betas=(0.9, 0.99), eps=1e-15)
with LambdaLR lr(iter) = lr0 * 0.1**(iter/iters), stepped every iteration;
Trainer ema_decay=0.95 via torch_ema (which warms up the decay as
min(decay, (1+n)/(10+n))).

TPU design: optax chain; the whole state (params, optimizer moments, EMA
shadow, step) is a single pytree so checkpointing, donation, and sharding
treat it uniformly.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray  # scalar int32


def make_lr_schedule(lr0, iters):
    def sched(step):
        return lr0 * 0.1 ** jnp.minimum(step / iters, 1.0)
    return sched


def make_optimizer(lr0, iters):
    return optax.adam(make_lr_schedule(lr0, iters), b1=0.9, b2=0.99, eps=1e-15)


def init_train_state(params, lr0, iters):
    opt = make_optimizer(lr0, iters)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        step=jnp.zeros((), jnp.int32),
    ), opt


def ema_update(ema_params, params, step, decay=0.95):
    """torch_ema-style warmup: decay_t = min(decay, (1+n)/(10+n))."""
    n = step.astype(jnp.float32)
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema_params, params)


def apply_updates(state, grads, opt, ema_decay=0.95):
    updates, new_opt_state = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_ema = ema_update(state.ema_params, new_params, state.step, ema_decay)
    return TrainState(new_params, new_opt_state, new_ema, state.step + 1)
