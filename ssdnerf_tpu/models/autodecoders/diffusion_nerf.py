"""Single-stage Diffusion NeRF (flagship model).

TPU-native re-design of ``DiffusionNeRF``
(/root/reference/lib/models/autodecoders/diffusion_nerf.py): the train step
composes the diffusion prior loss and inverse rendering into one jitted
function.  The reference's ``.grad.copy_(prior_grad)`` surgery
(diffusion_nerf.py:128-137,156-158) becomes an explicit gradient sum; the
``val_guide`` density-grid side state is threaded through the DDIM scan
carry; fp16 autocast sampling maps to bf16 params/activations on TPU.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..diffusions.gaussian_diffusion import GaussianDiffusion
from ..decoders.renderer import update_density_grid, get_density
from .base import (adam_init, adam_step, ray_sample, make_raybatch_indices,
                   rendering_loss, inverse_code)
from .multiscene import MultiSceneNeRF, psnr


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


class DiffusionNeRF(MultiSceneNeRF):

    def __init__(self, cfg, train_cfg=None, test_cfg=None):
        super().__init__(cfg, train_cfg, test_cfg)
        cfg = dict(cfg)
        self.diffusion = GaussianDiffusion.from_cfg(cfg['diffusion'])
        self.diffusion_use_ema = cfg.get('diffusion_use_ema', True)
        self.freeze_decoder = cfg.get('freeze_decoder', True)
        self.image_cond = cfg.get('image_cond', False)
        self.code_permute = cfg.get('code_permute')
        self.code_reshape = tuple(cfg['code_reshape']) \
            if cfg.get('code_reshape') else None
        self.autocast_dtype = cfg.get('autocast_dtype')
        self.freeze_norm = False  # mutable via ModelUpdaterHook
        if self.code_permute is not None:
            self.code_reshape_inv = tuple(
                self.code_size[ax] for ax in self.code_permute)
            self.code_permute_inv = tuple(
                self.code_permute.index(ax)
                for ax in range(len(self.code_permute)))
        else:
            self.code_reshape_inv = self.code_size
            self.code_permute_inv = None

    # -------------------------------------------------------------- #
    # code <-> diffusion layout (diffusion_nerf.py:50-64)
    # -------------------------------------------------------------- #
    def code_diff_pr(self, code):
        out = code
        if self.code_permute is not None:
            out = out.transpose([0] + [ax + 1 for ax in self.code_permute])
        if self.code_reshape is not None:
            out = out.reshape((code.shape[0],) + self.code_reshape)
        return out

    def code_diff_pr_inv(self, code_diff):
        out = code_diff
        if self.code_reshape is not None:
            out = out.reshape((code_diff.shape[0],) + self.code_reshape_inv)
        if self.code_permute_inv is not None:
            out = out.transpose([0] + [ax + 1 for ax in self.code_permute_inv])
        return out

    # -------------------------------------------------------------- #
    # state
    # -------------------------------------------------------------- #
    def init_state(self, key, optimizer_cfg=None, lr_schedules=None):
        optimizer_cfg = optimizer_cfg or {}
        lr_schedules = lr_schedules or {}
        k_dec, k_diff = jax.random.split(key)
        state = super().init_state(k_dec, optimizer_cfg.get('decoder'),
                                   lr_schedules.get('decoder'))
        diff_params = self.diffusion.init_params(k_diff)
        state['diffusion'] = diff_params
        if self.diffusion_use_ema:
            state['diffusion_ema'] = jax.tree_util.tree_map(
                jnp.copy, diff_params)
        tx = self.make_optimizer(optimizer_cfg.get('diffusion'),
                                 lr_schedules.get('diffusion'), 'diffusion')
        state['opt_diffusion'] = tx.init(diff_params)
        state['ddpm_loss'] = self.diffusion.ddpm_loss.init_state()
        return state

    def _train_decoder_params(self, state):
        if self.freeze_decoder and self.decoder_use_ema:
            return state['decoder_ema']
        return state['decoder']

    def _image_cond_train(self, data, key):
        """Pick one random cond view per scene, tile to the diffusion
        image size (diffusion_nerf.py:103-110).  NCHW output."""
        cond_imgs = data['cond_imgs']
        S, V, h, w, _ = cond_imgs.shape
        idx = jax.random.randint(key, (S,), 0, V)
        sel = jnp.take_along_axis(
            cond_imgs, idx[:, None, None, None, None], axis=1)[:, 0]
        cc = sel.transpose(0, 3, 1, 2)  # (S, 3, h, w)
        H, W = self.diffusion.denoising.image_size
        return jnp.tile(cc, (1, 1, H // h, W // w))

    def _image_cond_multi(self, data, key):
        """All cond views, shuffled per scene, tiled (diffusion_nerf.py:257-267)."""
        cond_imgs = data['cond_imgs']
        S, V, h, w, _ = cond_imgs.shape
        cc = cond_imgs.transpose(0, 1, 4, 2, 3)  # (S, V, 3, h, w)
        if V > 1:
            keys = jax.random.split(key, S)
            perm = jax.vmap(lambda k: jax.random.permutation(k, V))(keys)
            cc = jnp.take_along_axis(
                cc, perm[:, :, None, None, None], axis=1)
        H, W = self.diffusion.denoising.image_size
        return jnp.tile(cc, (1, 1, 1, H // h, W // w))

    # -------------------------------------------------------------- #
    # single-stage train step (diffusion_nerf.py:66-189)
    # -------------------------------------------------------------- #
    def train_step(self, state, scene_batch, data, key, tx_diffusion,
                   tx_decoder):
        tc = self.train_cfg
        decoder_params = self._train_decoder_params(state)
        extra_scene_step = tc.get('extra_scene_step', 0)
        x_t_detach = tc.get('x_t_detach', False)
        has_cond = 'cond_imgs' in data

        stage2 = scene_batch is None  # precomputed codes from the dataset
        (key, k_cond, k_diff, k_drop, k_inv, k_upd, k_ray,
         k_pert) = jax.random.split(key, 8)

        if stage2:
            # codes come activated from the dataset (diffusion_nerf.py:77-79)
            code = data['code']
            code_ = opt = grid = bitfield = None
            new_act_state = state['code_act']
        else:
            code_ = scene_batch['code_']
            opt = scene_batch['opt']
            grid = scene_batch['density_grid']
            bitfield = scene_batch['density_bitfield']
            code, new_act_state = self.code_activation(
                code_, state['code_act'], update_stats=True)

        concat_cond = None
        if has_cond and self.image_cond:
            concat_cond = self._image_cond_train(data, k_cond)

        # ---- diffusion step ----
        update_norm = not self.freeze_norm

        def diff_loss_fn(diff_params, code__):
            code_in = code if stage2 else \
                self.code_activation(code__, state['code_act'])
            loss, new_loss_state, logs = self.diffusion.forward_train(
                diff_params, self.code_diff_pr(code_in), k_diff,
                state['ddpm_loss'], concat_cond=concat_cond,
                x_t_detach=x_t_detach, cfg=tc, update_norm=update_norm,
                deterministic=False, dropout_key=k_drop)
            return loss, (new_loss_state, logs)

        (loss_diff, (new_loss_state, log_vars)), (g_diff, prior_grad) = \
            jax.value_and_grad(diff_loss_fn, argnums=(0, 1), has_aux=True)(
                state['diffusion'],
                code_ if not stage2 else jnp.zeros(()))
        updates, new_opt_diff = tx_diffusion.update(
            g_diff, state['opt_diffusion'], state['diffusion'])
        new_diffusion = optax.apply_updates(state['diffusion'], updates)
        state = dict(state, diffusion=new_diffusion,
                     opt_diffusion=new_opt_diff, ddpm_loss=new_loss_state,
                     code_act=new_act_state)
        log_vars = dict(log_vars, loss_diffusion=loss_diff)
        if tc.get('log_grad_stats', False):
            from .base import grad_stats_logvars
            log_vars.update(grad_stats_logvars('diffusion', g_diff))

        if not has_cond or stage2:
            if not stage2:
                scene_batch = dict(code_=code_, opt=opt, density_grid=grid,
                                   density_bitfield=bitfield)
            return state, scene_batch, log_vars

        cond_imgs = data['cond_imgs']
        rays_o, rays_d, dt_gamma = self.cond_rays(data, tc)
        num_pixels = int(np.prod(cond_imgs.shape[1:4]))

        # ---- inner scene steps with prior grad ----
        if extra_scene_step > 0:
            code_, opt, grid, bitfield, aux = inverse_code(
                self.decoder, decoder_params, self.code_activation,
                state['code_act'], rays_o, rays_d, cond_imgs, k_inv,
                code_, opt, grid, bitfield,
                grid_size=self.grid_size, pixel_loss=self.pixel_loss,
                reg_loss=self.reg_loss, bg_color=self.bg_color,
                dt_gamma=dt_gamma, n_inverse_steps=extra_scene_step,
                n_inverse_rays=tc.get('n_inverse_rays', 4096),
                loss_coef=tc.get('loss_coef'),
                optimizer_cfg=tc.get('optimizer'),
                prior_grad=prior_grad,
                density_thresh=tc.get('density_thresh', 0.01),
                update_extra_interval=self.update_extra_interval,
                step_chunk=self.step_chunk,
                density_point_chunk=self.density_point_chunk,
                partial_density_updates=tc.get('density_partial_update',
                                               False))
            for k in ('pixel_loss', 'reg_loss'):
                if k in aux:
                    log_vars[k] = aux[k]

        # ---- final joint decoder + code step ----
        code = self.code_activation(code_, state['code_act'])
        grid, bitfield, _ = update_density_grid(
            self.decoder, decoder_params, code, grid, k_upd, self.grid_size,
            density_thresh=tc.get('density_thresh', 0.01),
            point_chunk=self.density_point_chunk)

        n_decoder_rays = tc.get('n_decoder_rays', 4096)
        b_rays_o, b_rays_d, target = ray_sample(
            rays_o, rays_d, cond_imgs, n_decoder_rays, key=k_ray)

        def dec_loss_fn(dec_params, code__):
            code = self.code_activation(code__, state['code_act'])
            loss, aux = rendering_loss(
                self.decoder, dec_params, code, bitfield, target,
                b_rays_o, b_rays_d, self.grid_size, self.pixel_loss,
                self.reg_loss, self.bg_color, dt_gamma, perturb_key=k_pert,
                scale_num_ray=num_pixels, loss_coef=tc.get('loss_coef'),
                step_chunk=self.step_chunk, deterministic=False)
            return loss, aux

        (loss_dec, (out_rgbs, loss_dict)), (g_dec, g_code) = \
            jax.value_and_grad(dec_loss_fn, argnums=(0, 1), has_aux=True)(
                decoder_params, code_)
        if tc.get('log_grad_stats', False):
            from .base import grad_stats_logvars
            log_vars.update(grad_stats_logvars('decoder', g_dec))
            log_vars.update(grad_stats_logvars('code', g_code))
        if not self.freeze_decoder:
            updates, new_opt_dec = tx_decoder.update(
                g_dec, state['opt_decoder'], state['decoder'])
            state = dict(state,
                         decoder=optax.apply_updates(state['decoder'], updates),
                         opt_decoder=new_opt_dec)
        g_code = g_code + prior_grad
        opt_cfg = tc.get('optimizer', {})
        code_, opt = adam_step(
            code_, g_code, opt, opt_cfg.get('lr', 1e-2),
            tuple(opt_cfg.get('betas', (0.9, 0.999))),
            weight_decay=opt_cfg.get('weight_decay', 0.0))

        code = self.code_activation(code_, state['code_act'])
        if state.get('init_code') is not None:
            state['init_code'] = (
                (1 - self.mean_ema_momentum) * state['init_code']
                + self.mean_ema_momentum * code.mean(axis=0))

        log_vars.update(loss_dict)
        log_vars.update(
            loss_decoder=loss_dec,
            train_psnr=psnr(out_rgbs, target),
            code_rms=jnp.sqrt(jnp.mean(code ** 2)))
        scene_batch = dict(code_=code_, opt=opt, density_grid=grid,
                           density_bitfield=bitfield)
        return state, scene_batch, log_vars

    # -------------------------------------------------------------- #
    # test-time paths (diffusion_nerf.py:191-469)
    # -------------------------------------------------------------- #
    def _ema_diffusion(self, state):
        return state.get('diffusion_ema', state['diffusion']) \
            if self.diffusion_use_ema else state['diffusion']

    def _ema_decoder(self, state):
        return state.get('decoder_ema', state['decoder']) \
            if self.decoder_use_ema else state['decoder']

    def _autocast(self, params, x):
        if self.autocast_dtype in ('float16', 'bfloat16'):
            # TPU-native half precision is bf16
            return _cast_tree(params, jnp.bfloat16), x.astype(jnp.bfloat16)
        return params, x

    @property
    def sampling_diffusion(self):
        """The diffusion module used by the samplers: under autocast, a
        clone whose UNet computes in bf16.  Casting params alone (the old
        _autocast) changed nothing measurable — the f32 module dtype made
        every conv upcast its inputs back, and the bandwidth-bound UNet
        (PERF.md) ran at identical speed.  The bf16-dtype module halves
        the activation traffic instead."""
        if self.autocast_dtype in ('float16', 'bfloat16'):
            cached = self.__dict__.get('_sampling_diffusion')
            if cached is None:
                import dataclasses
                cached = dataclasses.replace(
                    self.diffusion,
                    denoising=self.diffusion.denoising.clone(
                        dtype='bfloat16'))
                self.__dict__['_sampling_diffusion'] = cached
            return cached
        return self.diffusion

    def val_uncond(self, state, noise, key, concat_cond=None):
        """Unconditional DDIM sampling + optional diffusion-prior code
        polish + density rebuild (diffusion_nerf.py:191-239).

        noise: (S, *code_size).
        """
        tcfg = self.test_cfg
        diff_params = self._ema_diffusion(state)
        dec_params = self._ema_decoder(state)
        k_samp, k_polish, k_dens = jax.random.split(key, 3)

        p, x = self._autocast(diff_params, self.code_diff_pr(noise))
        code_diff, _ = self.sampling_diffusion.sample_from_noise(
            p, x, k_samp, cfg=tcfg, concat_cond=concat_cond)
        code = self.code_diff_pr_inv(code_diff.astype(jnp.float32))

        n_inverse_steps = tcfg.get('n_inverse_steps', 0)
        if n_inverse_steps > 0:
            code_ = self.code_activation.inverse(code, state['code_act'])
            opt = adam_init(code_)
            opt_cfg = tcfg.get('optimizer', {})
            lr0 = opt_cfg.get('lr', 1e-2)
            sch = tcfg.get('lr_scheduler')
            gamma = sch['gamma'] if sch else None

            def polish_step(carry, k):
                code_, opt = carry

                def loss_fn(code__):
                    c = self.code_activation(code__, state['code_act'])
                    loss, _, _ = self.diffusion.forward_train(
                        diff_params, self.code_diff_pr(c), k,
                        state['ddpm_loss'], cfg=tcfg, update_norm=False)
                    return loss

                g = jax.grad(loss_fn)(code_)
                lr = lr0 if gamma is None else \
                    lr0 * gamma ** opt.step.astype(jnp.float32)
                code_, opt = adam_step(code_, g, opt, lr,
                                       tuple(opt_cfg.get('betas', (0.9, 0.999))))
                return (code_, opt), None

            (code_, _), _ = jax.lax.scan(
                polish_step, (code_, opt),
                jax.random.split(k_polish, n_inverse_steps))
            code = self.code_activation(code_, state['code_act'])

        density_grid, bitfield = get_density(
            self.decoder, dec_params, code, k_dens, self.grid_size,
            density_thresh=tcfg.get('density_thresh', 0.01),
            density_step=tcfg.get('density_step', 8),
            point_chunk=self.density_point_chunk)
        return code, density_grid, bitfield

    def val_guide(self, state, data, noise, key):
        """Reconstruction-guided DDIM sampling (diffusion_nerf.py:241-311).
        The guide renders the current x0 prediction against the cond views;
        the density grid/bitfield and the ray-batch cursor ride the scan
        carry as guide state."""
        tcfg = self.test_cfg
        diff_params = self._ema_diffusion(state)
        dec_params = self._ema_decoder(state)
        cond_imgs = data['cond_imgs']
        S, V, h, w, _ = cond_imgs.shape
        rays_o, rays_d, dt_gamma = self.cond_rays(data, tcfg)
        num_pixels = V * h * w
        n_inverse_rays = tcfg.get('n_inverse_rays', 4096)

        k_batch, k_cond, k_samp = jax.random.split(key, 3)
        # enough pre-shuffled ray batches to cycle through all guide calls
        num_calls = tcfg.get('num_timesteps', self.diffusion.num_timesteps) \
            * (1 + tcfg.get('langevin_steps', 0))
        raybatch_inds = make_raybatch_indices(
            k_batch, S, num_pixels, n_inverse_rays, num_calls)

        concat_cond = None
        if self.image_cond:
            concat_cond = self._image_cond_multi(data, k_cond)

        guide_state0 = dict(
            density_grid=jnp.zeros((S, self.grid_size ** 3), jnp.float32),
            density_bitfield=jnp.zeros((S, self.grid_size ** 3 // 8),
                                       jnp.uint8),
            step=jnp.zeros((), jnp.int32),
            key=jax.random.PRNGKey(0))

        def grad_guide_fn(x_0_pred, gstate):
            code_pred = self.code_diff_pr_inv(x_0_pred.astype(jnp.float32))
            ukey, pkey, nkey = jax.random.split(gstate['key'], 3)
            grid, bitfield, _ = update_density_grid(
                self.decoder, dec_params,
                jax.lax.stop_gradient(code_pred),
                gstate['density_grid'], ukey, self.grid_size,
                density_thresh=tcfg.get('density_thresh', 0.01),
                point_chunk=self.density_point_chunk)
            if raybatch_inds is not None:
                inds = raybatch_inds[gstate['step'] % raybatch_inds.shape[0]]
                b_o, b_d, target = ray_sample(
                    rays_o, rays_d, cond_imgs, n_inverse_rays,
                    sample_inds=inds)
            else:
                b_o, b_d, target = ray_sample(
                    rays_o, rays_d, cond_imgs, n_inverse_rays, key=nkey)
            loss, _ = rendering_loss(
                self.decoder, dec_params, code_pred, bitfield, target,
                b_o, b_d, self.grid_size, self.pixel_loss, self.reg_loss,
                self.bg_color, dt_gamma, perturb_key=pkey,
                scale_num_ray=target.shape[1],
                loss_coef=tcfg.get('loss_coef'),
                step_chunk=self.step_chunk, deterministic=False)
            new_state = dict(density_grid=jax.lax.stop_gradient(grid),
                             density_bitfield=bitfield,
                             step=gstate['step'] + 1, key=nkey)
            return loss * S, new_state

        p, x = self._autocast(diff_params, self.code_diff_pr(noise))
        code_diff, gstate = self.sampling_diffusion.sample_from_noise(
            p, x, k_samp, cfg=tcfg, concat_cond=concat_cond,
            grad_guide_fn=grad_guide_fn, guide_state=guide_state0)
        code = self.code_diff_pr_inv(code_diff.astype(jnp.float32))
        return code, gstate['density_grid'], gstate['density_bitfield']

    def val_optim(self, state, data, key, code_=None, density_grid=None,
                  density_bitfield=None):
        """Optimization-based finetuning against diffusion + rendering
        losses (diffusion_nerf.py:313-404), as a scan over outer steps."""
        tcfg = self.test_cfg
        diff_params = self._ema_diffusion(state)
        dec_params = self._ema_decoder(state)
        cond_imgs = data['cond_imgs']
        S, V, h, w, _ = cond_imgs.shape
        rays_o, rays_d, dt_gamma = self.cond_rays(data, tcfg)
        extra_scene_step = tcfg.get('extra_scene_step', 0)
        n_inverse_steps = tcfg.get('n_inverse_steps', 100)
        x_t_detach = tcfg.get('x_t_detach', False)
        opt_cfg = tcfg.get('optimizer', {})
        lr0 = opt_cfg.get('lr', 1e-2)
        sch = tcfg.get('lr_scheduler')
        gamma = sch['gamma'] if sch else None

        key, k_cond, k_init = jax.random.split(key, 3)
        concat_cond = None
        if self.image_cond:
            concat_cond = self._image_cond_multi(data, k_cond)

        if code_ is None:
            if state.get('init_code') is not None:
                inv = self.code_activation.inverse(
                    state['init_code'] * self.mean_scale, state['code_act'])
                code_ = jnp.broadcast_to(inv[None], (S,) + self.code_size)
            else:
                code_ = jax.random.uniform(
                    k_init, (S,) + self.code_size,
                    minval=-self.init_scale, maxval=self.init_scale)
        if density_grid is None:
            density_grid = jnp.zeros((S, self.grid_size ** 3), jnp.float16)
        if density_bitfield is None:
            density_bitfield = jnp.zeros((S, self.grid_size ** 3 // 8),
                                         jnp.uint8)
        opt = adam_init(code_)

        def outer_step(carry, xs):
            code_, opt, grid, bitfield = carry
            step_i, k = xs
            k_diff, k_drop, k_inv = jax.random.split(k, 3)

            cc = None
            if concat_cond is not None:
                cc = concat_cond[:, step_i % V]

            def diff_loss_fn(code__):
                c = self.code_activation(code__, state['code_act'])
                loss, _, _ = self.diffusion.forward_train(
                    diff_params, self.code_diff_pr(c), k_diff,
                    state['ddpm_loss'], concat_cond=cc,
                    x_t_detach=x_t_detach, cfg=tcfg, update_norm=False)
                return loss

            prior_grad = jax.grad(diff_loss_fn)(code_)

            if extra_scene_step > 0:
                code_, opt, grid, bitfield, _ = inverse_code(
                    self.decoder, dec_params, self.code_activation,
                    state['code_act'], rays_o, rays_d, cond_imgs, k_inv,
                    code_, opt, grid, bitfield,
                    grid_size=self.grid_size, pixel_loss=self.pixel_loss,
                    reg_loss=self.reg_loss, bg_color=self.bg_color,
                    dt_gamma=dt_gamma,
                    n_inverse_steps=extra_scene_step + 1,
                    n_inverse_rays=tcfg.get('n_inverse_rays', 4096),
                    loss_coef=tcfg.get('loss_coef'),
                    optimizer_cfg=opt_cfg, lr_scheduler_cfg=sch,
                    prior_grad=prior_grad,
                    density_thresh=tcfg.get('density_thresh', 0.01),
                    update_extra_interval=self.update_extra_interval,
                    step_chunk=self.step_chunk,
                    density_point_chunk=self.density_point_chunk,
                    partial_density_updates=tcfg.get(
                        'density_partial_update', False))
            else:
                k_upd, k_ray, k_pert = jax.random.split(k_inv, 3)
                code = self.code_activation(code_, state['code_act'])
                grid, bitfield, _ = update_density_grid(
                    self.decoder, dec_params, code, grid, k_upd,
                    self.grid_size,
                    density_thresh=tcfg.get('density_thresh', 0.01),
                    point_chunk=self.density_point_chunk)
                b_o, b_d, target = ray_sample(
                    rays_o, rays_d, cond_imgs,
                    tcfg.get('n_decoder_rays', 4096), key=k_ray)

                def dec_loss_fn(code__):
                    c = self.code_activation(code__, state['code_act'])
                    loss, _ = rendering_loss(
                        self.decoder, dec_params, c, bitfield, target,
                        b_o, b_d, self.grid_size, self.pixel_loss,
                        self.reg_loss, self.bg_color, dt_gamma,
                        perturb_key=k_pert, scale_num_ray=V * h * w,
                        loss_coef=tcfg.get('loss_coef'),
                        step_chunk=self.step_chunk, deterministic=False)
                    return loss

                g = jax.grad(dec_loss_fn)(code_) + prior_grad
                lr = lr0 if gamma is None else \
                    lr0 * gamma ** opt.step.astype(jnp.float32)
                code_, opt = adam_step(
                    code_, g, opt, lr,
                    tuple(opt_cfg.get('betas', (0.9, 0.999))))
            return (code_, opt, grid, bitfield), None

        xs = (jnp.arange(n_inverse_steps),
              jax.random.split(key, n_inverse_steps))
        (code_, opt, density_grid, density_bitfield), _ = jax.lax.scan(
            outer_step, (code_, opt, density_grid, density_bitfield), xs)
        code = self.code_activation(code_, state['code_act'])
        return code, density_grid, density_bitfield

    def val_step(self, state, data, key):
        """Dispatch on cond_mode (diffusion_nerf.py:406-434).
        Returns (code, density_grid, density_bitfield)."""
        key, k_noise = jax.random.split(key)
        if 'cond_imgs' in data:
            cond_mode = self.test_cfg.get('cond_mode', 'guide')
            S = data['cond_imgs'].shape[0]
            noise = data.get('noise')
            if noise is None:
                noise = jax.random.normal(k_noise, (S,) + self.code_size)
            if cond_mode == 'guide':
                return self.val_guide(state, data, noise, key)
            if cond_mode == 'optim':
                return self.val_optim(state, data, key)
            if cond_mode == 'guide_optim':
                code, grid, bitfield = self.val_guide(state, data, noise, key)
                code_ = self.code_activation.inverse(code, state['code_act'])
                return self.val_optim(state, data, key, code_=code_,
                                      density_grid=grid.astype(jnp.float16),
                                      density_bitfield=bitfield)
            raise ValueError(cond_mode)
        S = len(data['scene_id'])
        noise = data.get('noise')
        if noise is None:
            noise = jax.random.normal(k_noise, (S,) + self.code_size)
        return self.val_uncond(state, noise, key)
