#!/usr/bin/env python
"""Break the flagship train step's ess->0 base (~98 ms, PERF.md) into
measured components on the TPU.

PERF.md's train-step table attributes the ess->0 extrapolated base to
UNet fwd+bwd (40.2 ms, measured standalone) + final render-grad (~16) +
density update + "glue ~35" — but the glue figure was a residual, not a
measurement.  This tool times each piece as its own jitted loop in ONE
process (amortizing the ~140 s axon tunnel init) so the residual is
pinned to real components:

  1. full train_step at ess=1 (the PERF.md table row)
  2. diffusion-only half: UNet loss fwd+bwd grad + optax Adam update
  3. update_density_grid (one full 2.1M-point sweep)
  4. inner inverse_code at n_inverse_steps=1 (sweep + render-grad + Adam)
  5. final render-grad (decoder+code grads) + code Adam
  6. code_activation with running-stat update (expected ~0)

Each piece runs n iterations inside one jitted fori_loop with perturbed
inputs (the PERF.md methodology: defeats loop-invariant hoisting and the
~30 ms/dispatch tunnel RTT).  Reference cost model being decomposed:
/root/reference/lib/models/autodecoders/diffusion_nerf.py:66-189.
"""
import os, sys, time
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np, jax, jax.numpy as jnp
if os.environ.get('GLUE_TINY'):
    # CPU smoke mode — the bundled TPU plugin ignores the JAX_PLATFORMS
    # env var, so pin via config (same trick as tests/conftest.py)
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from ssdnerf_tpu.models.autodecoders.base import (
    adam_init, adam_step, ray_sample, rendering_loss, inverse_code)
from ssdnerf_tpu.models.decoders.renderer import update_density_grid
from synthetic import make_batch

N_TIME = int(os.environ.get('GLUE_N_TIME', '10'))
CFG = os.environ.get('GLUE_CFG',
                     '/root/repo/configs/paper_cfgs/ssdnerf_cars_uncond.py')
IMG = int(os.environ.get('GLUE_IMG', '128'))

# Dispatch+readback RTT subtracted from every loop timing: measured per
# run (empty jitted readback) so non-axon environments (local TPU, the
# GLUE_TINY CPU mode) get their true near-zero value instead of a
# hard-coded 30 ms producing negative timings.
from ssdnerf_tpu.core.timing import measure_rtt  # noqa: E402
RTT = measure_rtt()
print(f'measured dispatch RTT: {RTT * 1e3:.1f} ms', flush=True)


def _sync(out):
    """Host readback — jax.block_until_ready is unreliable on axon
    (PERF.md methodology / verify-skill gotcha)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[0])


def timed(name, fn, *args):
    """Median-of-3 of an n-iteration loop of fn (fn jitted outside)."""
    _sync(fn(*args))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best.append(time.perf_counter() - t0)
    dt = (sorted(best)[1] - RTT) / N_TIME
    print(f'{name:44s} {dt * 1e3:8.2f} ms', flush=True)
    return dt


def main():
    if os.environ.get('GLUE_TINY'):
        # CPU smoke mode: validates tracing/structure only, not timings
        from synthetic import TINY_MODEL_CFG, TINY_TRAIN_CFG, TINY_TEST_CFG
        tc = dict(TINY_TRAIN_CFG, extra_scene_step=1)
        model = build_model(TINY_MODEL_CFG, train_cfg=tc,
                            test_cfg=dict(TINY_TEST_CFG))
        S, V, img = 2, 2, 16
    else:
        base = Config.fromfile(CFG)
        tc = dict(base.train_cfg, extra_scene_step=1)
        tc.pop('cache_load_from', None)
        model = build_model(dict(base.model, cache_size=8), train_cfg=tc,
                            test_cfg=dict(base.test_cfg))
        model.set_dotted('decoder.pack_slots', 512)
        model.set_dotted('decoder.march_slots', 128)
        S, V, img = 8, 4, IMG
    data_np = make_batch(num_scenes=S, num_views=V, h=img, w=img)
    data = {k: jnp.asarray(v) for k, v in data_np.items()
            if k != 'scene_name'}
    opt_cfgs = dict(diffusion=dict(type='Adam', lr=1e-4),
                    decoder=dict(type='Adam', lr=1e-3))
    state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
    tx_d = model.make_optimizer(opt_cfgs['diffusion'], None, 'x')
    tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'x')
    rng = np.random.RandomState(0)
    code_ = jnp.asarray(model.get_init_code_np(S, rng))
    H = model.grid_size
    ax = np.linspace(-1, 1, H)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    occ = ((X / 0.9) ** 2 + (Y / 0.45) ** 2 + (Z / 0.6) ** 2) < 1.0
    from ssdnerf_tpu.ops.morton import packbits
    bf = packbits(jnp.broadcast_to(
        jnp.asarray(occ.reshape(-1), jnp.float32), (S, H ** 3)), 0.5)
    grid = jnp.where(jnp.asarray(occ.reshape(-1))[None], 0.5,
                     0.0).astype(jnp.float16)
    grid = jnp.broadcast_to(grid, (S, H ** 3))
    batch = dict(code_=code_, opt=adam_init(code_),
                 density_grid=grid, density_bitfield=bf)
    dec_params = state['decoder']
    diff_params = state['diffusion']
    act_state = state['code_act']
    rays_o, rays_d, dt_gamma = model.cond_rays(data, tc)
    cond_imgs = data['cond_imgs']
    num_pixels = int(np.prod(cond_imgs.shape[1:4]))
    k0 = jax.random.PRNGKey(7)

    def loop(body):
        """n-iteration fori with an input perturbation each iter."""
        def run(c0):
            def it(i, c):
                return body(c, i)
            return jax.lax.fori_loop(0, N_TIME, it, c0)
        return jax.jit(run)

    # 1. full train step (context row; matches trainstep_bench ess=1 pack,
    # including its donate_argnums=(0,1) — without donation XLA keeps the
    # inputs alive and allocates fresh outputs, inflating this baseline
    # and therefore the residual this tool exists to pin down)
    step = jax.jit(lambda s, b, d, k: model.train_step(s, b, d, k,
                                                       tx_d, tx_dec),
                   donate_argnums=(0, 1))
    s1, b1, logs = step(state, batch, data, k0)
    _ = float(logs['loss_diffusion'])
    best = []
    for r in range(3):
        t0 = time.perf_counter()
        for i in range(N_TIME):
            s1, b1, logs = step(s1, b1, data, jax.random.fold_in(k0, i))
        _ = float(logs['loss_diffusion'])
        best.append(time.perf_counter() - t0)
    full = (sorted(best)[1] - RTT) / N_TIME
    print(f'{"full train_step ess=1 pack":44s} {full * 1e3:8.2f} ms',
          flush=True)

    # 2. diffusion half: UNet grad + Adam (prior_grad wrt code too)
    def diff_half(c, i):
        code__, diff_p, opt_s = c
        code__ = code__ + 1e-6 * i.astype(jnp.float32)

        def loss_fn(dp, cc):
            code = model.code_activation(cc, act_state)
            loss, _, _ = model.diffusion.forward_train(
                dp, model.code_diff_pr(code), jax.random.fold_in(k0, i),
                state['ddpm_loss'], cfg=tc, update_norm=True,
                deterministic=False, dropout_key=jax.random.fold_in(k0, i + 1))
            return loss

        (g_diff, prior_grad) = jax.grad(loss_fn, argnums=(0, 1))(
            diff_p, code__)
        upd, new_opt = tx_d.update(g_diff, opt_s, diff_p)
        import optax
        # 1e-30 (not 0) keeps XLA from dead-code-eliminating the grad
        return (code__ + 1e-30 * prior_grad.mean(), optax.apply_updates(
            diff_p, upd), new_opt)

    t_diff = timed('diffusion half (UNet grad + Adam)', loop(diff_half),
                   (code_, diff_params, state['opt_diffusion']))

    # 3. one full density sweep
    def dens(c, i):
        code__, grid_c = c
        code = model.code_activation(code__ + 1e-6 * i.astype(jnp.float32),
                                     act_state)
        g, bfld, _ = update_density_grid(
            model.decoder, dec_params, code, grid_c,
            jax.random.fold_in(k0, i), model.grid_size,
            density_thresh=tc.get('density_thresh', 0.01),
            point_chunk=model.density_point_chunk)
        # fold the bitfield into the carry: dropping it lets XLA dead-code
        # eliminate the packbits repack and undercount this component
        return (code__ + 1e-30 * jnp.sum(bfld.astype(jnp.float32)), g)

    t_dens = timed('update_density_grid full sweep', loop(dens),
                   (code_, grid))

    # 4. inner inverse_code, 1 step (sweep + render-grad + code Adam)
    def inner(c, i):
        code__, opt, grid_c, bf_c = c
        code__ = code__ + 1e-6 * i.astype(jnp.float32)
        code__, opt, grid_c, bf_c, _ = inverse_code(
            model.decoder, dec_params, model.code_activation, act_state,
            rays_o, rays_d, cond_imgs, jax.random.fold_in(k0, i),
            code__, opt, grid_c, bf_c, grid_size=model.grid_size,
            pixel_loss=model.pixel_loss, reg_loss=model.reg_loss,
            bg_color=model.bg_color, dt_gamma=dt_gamma,
            n_inverse_steps=1, n_inverse_rays=tc.get('n_inverse_rays', 4096),
            loss_coef=tc.get('loss_coef'), optimizer_cfg=tc.get('optimizer'),
            prior_grad=jnp.zeros_like(code__),
            density_thresh=tc.get('density_thresh', 0.01),
            update_extra_interval=model.update_extra_interval,
            step_chunk=model.step_chunk,
            density_point_chunk=model.density_point_chunk)
        return (code__, opt, grid_c, bf_c)

    t_inner = timed('inner inverse_code n=1 (sweep+render+Adam)',
                    loop(inner), (code_, adam_init(code_), grid, bf))

    # 5. final joint render-grad (decoder+code) + code Adam
    def final(c, i):
        code__, opt = c
        code__ = code__ + 1e-6 * i.astype(jnp.float32)
        b_o, b_d, target = ray_sample(
            rays_o, rays_d, cond_imgs, tc.get('n_decoder_rays', 4096),
            key=jax.random.fold_in(k0, i))

        def loss_fn(dp, cc):
            code = model.code_activation(cc, act_state)
            loss, aux = rendering_loss(
                model.decoder, dp, code, bf, target, b_o, b_d,
                model.grid_size, model.pixel_loss, model.reg_loss,
                model.bg_color, dt_gamma,
                perturb_key=jax.random.fold_in(k0, i + 3),
                scale_num_ray=num_pixels, loss_coef=tc.get('loss_coef'),
                step_chunk=model.step_chunk, deterministic=False)
            return loss, aux

        (_, _), (g_dec, g_code) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(dec_params, code__)
        opt_cfg = tc.get('optimizer', {})
        code__, opt = adam_step(code__, g_code, opt,
                                opt_cfg.get('lr', 1e-2),
                                tuple(opt_cfg.get('betas', (0.9, 0.999))))
        return (code__ + 1e-30 * sum(jnp.sum(x) for x in
                                     jax.tree_util.tree_leaves(g_dec)), opt)

    t_final = timed('final render-grad (dec+code) + Adam', loop(final),
                    (code_, adam_init(code_)))

    # 6. code activation + stats
    def act(c, i):
        code__ = c + 1e-6 * i.astype(jnp.float32)
        code, _ = model.code_activation(code__, act_state,
                                        update_stats=True)
        return c + 1e-30 * code.mean()

    t_act = timed('code_activation + running stats', loop(act), code_)

    known = t_diff + t_dens + t_inner + t_final + t_act
    print('-' * 56)
    print(f'{"sum of parts":44s} {known * 1e3:8.2f} ms')
    print(f'{"full step":44s} {full * 1e3:8.2f} ms')
    print(f'{"residual (true glue)":44s} {(full - known) * 1e3:8.2f} ms')


if __name__ == '__main__':
    main()
