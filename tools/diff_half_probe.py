#!/usr/bin/env python
"""Decompose the train step's diffusion half (glue_breakdown row 2).

glue_breakdown measured the full diffusion half (UNet value_and_grad wrt
params+codes, optax Adam, scale_norm update) at ~64 ms while the
standalone UNet fwd+bwd costs ~40 ms — this pins the ~24 ms gap to a
component: grad-wrt-params only, +grad-wrt-codes, +Adam, +code
activation inside the loss.
"""
import os
import sys
import time

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tests')

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

import optax

from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from ssdnerf_tpu.core.timing import measure_rtt

RTT = measure_rtt()
print(f'measured dispatch RTT: {RTT * 1e3:.1f} ms', flush=True)
N_TIME = 10


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timed(name, fn, *args):
    _sync(fn(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best.append(time.perf_counter() - t0)
    dt = (sorted(best)[1] - RTT) / N_TIME
    print(f'{name:52s} {dt * 1e3:8.2f} ms', flush=True)
    return dt


def loop(body):
    def run(c0):
        def it(i, c):
            return body(c, i)
        return jax.lax.fori_loop(0, N_TIME, it, c0)
    return jax.jit(run)


def main():
    base = Config.fromfile(
        '/root/repo/configs/paper_cfgs/ssdnerf_cars_uncond.py')
    tc = dict(base.train_cfg, extra_scene_step=1)
    tc.pop('cache_load_from', None)
    model = build_model(dict(base.model, cache_size=8), train_cfg=tc,
                        test_cfg=dict(base.test_cfg))
    S = 8
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=1e-4),
                    decoder=dict(type='Adam', lr=1e-3))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_d = model.make_optimizer(opt_cfgs['diffusion'], None, 'x')
    rng = np.random.RandomState(0)
    code_ = jnp.asarray(model.get_init_code_np(S, rng))
    act_state = state['code_act']
    diff_params = state['diffusion']
    opt_state = state['opt_diffusion']
    k0 = jax.random.PRNGKey(7)

    def loss_of(dp, cc, i):
        code = model.code_activation(cc, act_state)
        loss, _, _ = model.diffusion.forward_train(
            dp, model.code_diff_pr(code), jax.random.fold_in(k0, i),
            state['ddpm_loss'], cfg=tc, update_norm=True,
            deterministic=False, dropout_key=jax.random.fold_in(k0, i + 1))
        return loss

    # params ride the carry: a closed-over tree would be baked into the
    # HLO as ~450 MB of literals (the axon remote-compile rejects it)
    # a. UNet loss fwd only
    def fwd_only(carry, i):
        c, dp = carry
        code__ = c + 1e-6 * i.astype(jnp.float32)
        return (c + 1e-30 * loss_of(dp, code__, i), dp)

    timed('a. loss forward only', loop(fwd_only), (code_, diff_params))

    # b. grad wrt params only
    def grad_p(carry, i):
        c, dp = carry
        code__ = c + 1e-6 * i.astype(jnp.float32)
        g = jax.grad(loss_of)(dp, code__, i)
        s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return (c + 1e-30 * s, dp)

    timed('b. value_and_grad wrt params', loop(grad_p),
          (code_, diff_params))

    # c. grad wrt params + codes (the step's actual structure)
    def grad_pc(carry, i):
        c, dp = carry
        code__ = c + 1e-6 * i.astype(jnp.float32)
        g, pg = jax.grad(loss_of, argnums=(0, 1))(dp, code__, i)
        s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
        return (c + 1e-30 * (s + pg.mean()), dp)

    timed('c. + grad wrt codes (prior_grad)', loop(grad_pc),
          (code_, diff_params))

    # d. + Adam update (carry the params/opt like the real step)
    def grad_pc_adam(carry, i):
        c, dp, os_ = carry
        code__ = c + 1e-6 * i.astype(jnp.float32)
        (g, pg) = jax.grad(loss_of, argnums=(0, 1))(dp, code__, i)
        upd, os2 = tx_d.update(g, os_, dp)
        return (c + 1e-30 * pg.mean(), optax.apply_updates(dp, upd), os2)

    timed('d. + optax Adam on the UNet', loop(grad_pc_adam),
          (code_, diff_params, opt_state))


if __name__ == '__main__':
    main()
