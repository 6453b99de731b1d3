"""DDPM/DDIM diffusion core.

Functional re-design of ``GaussianDiffusion``
(/root/reference/lib/models/diffusions/gaussian_diffusion.py): schedule
arrays are compile-time numpy constants, samplers are ``lax.scan`` loops
over precomputed timestep sequences, reconstruction guidance is ``jax.grad``
through the UNet (gaussian_diffusion.py:180-240), and all running state
(scale-norm factor, guidance side state such as the density grid) is
threaded explicitly.

Code layout convention: diffusion-space tensors are NCHW ``(B, C, H, W)`` to
match the reference's ``code_diff_pr`` layout; the transpose to the UNet's
NHWC happens at the boundary here.
"""
import math
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule, make_schedule
from .sampler import build_timestep_sampler
from ..losses import build_ddpm_loss
from ..architecture.unet import DenoisingUnet


def _bcast(arr, t, ndim):
    """Gather schedule values at (traced) integer t and append singleton
    dims for broadcasting against (B, C, H, W)."""
    vals = jnp.asarray(arr, jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


@dataclass(frozen=True)
class GaussianDiffusion:
    denoising: DenoisingUnet
    schedule: DiffusionSchedule
    timestep_sampler: Any
    ddpm_loss: Any
    num_timesteps: int = 1000
    denoising_mean_mode: str = 'V'
    denoising_var_mode: str = 'FIXED_LARGE'
    sample_method: str = 'ddim'

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @staticmethod
    def from_cfg(cfg):
        cfg = dict(cfg)
        cfg.pop('type', None)
        num_timesteps = cfg.get('num_timesteps', 1000)
        schedule = make_schedule(cfg.get('betas_cfg', {'type': 'cosine'}),
                                 num_timesteps)
        mean_mode = cfg.get('denoising_mean_mode', 'V')
        sampler = build_timestep_sampler(
            cfg.get('timestep_sampler', {'type': 'UniformTimeStepSampler'}),
            schedule, mean_mode)
        loss = build_ddpm_loss(
            cfg.get('ddpm_loss', {'type': 'DDPMMSELossMod'}), sampler,
            num_timesteps)
        den_cfg = dict(cfg['denoising'])
        den_cfg.pop('type', None)
        image_size = den_cfg.pop('image_size')
        if isinstance(image_size, int):
            image_size = (image_size, image_size)
        den_cfg['image_size'] = tuple(image_size)
        for k in ('channels_cfg', 'attention_res'):
            if k in den_cfg:
                den_cfg[k] = tuple(den_cfg[k])
        unet = DenoisingUnet(num_timesteps=num_timesteps, **den_cfg)
        return GaussianDiffusion(
            denoising=unet, schedule=schedule, timestep_sampler=sampler,
            ddpm_loss=loss, num_timesteps=num_timesteps,
            denoising_mean_mode=mean_mode,
            denoising_var_mode=cfg.get('denoising_var_mode', 'FIXED_LARGE'),
            sample_method=cfg.get('sample_method', 'ddim'))

    def init_params(self, key, batch=1):
        h, w = self.denoising.image_size
        c = self.denoising.in_channels
        cc = self.denoising.concat_cond_channels
        x = jnp.zeros((batch, h, w, c + 0))
        cond = jnp.zeros((batch, h, w, cc)) if cc > 0 else None
        return self.denoising.init(key, x, jnp.zeros((batch,), jnp.int32),
                                   concat_cond=cond)

    # ------------------------------------------------------------------ #
    # forward diffusion
    # ------------------------------------------------------------------ #
    def q_sample(self, x_0, t, noise):
        mean = _bcast(self.schedule.sqrt_alphas_bar, t, x_0.ndim)
        std = _bcast(self.schedule.sqrt_one_minus_alphas_bar, t, x_0.ndim)
        return x_0 * mean + noise * std, mean, std

    def _apply_unet(self, params, x_t, t, concat_cond=None, deterministic=True,
                    dropout_key=None, nhwc=False):
        """NCHW in/out wrapper around the NHWC UNet.

        ``nhwc=True`` skips the layout transposes for callers that keep the
        sampling chain NHWC-resident (ddim_sample/ddpm_sample): the NCHW
        code layout has an 18-channel minor dim after transpose, which TPU
        pads to 128 lanes — two such relayouts per sampler step measured
        ~2 ms/step (tools/ddim_probe.py)."""
        if nhwc:
            rngs = {'dropout': dropout_key} if dropout_key is not None else {}
            return self.denoising.apply(params, x_t, t, concat_cond=concat_cond,
                                        deterministic=deterministic, rngs=rngs)
        h = jnp.transpose(x_t, (0, 2, 3, 1))
        cc = jnp.transpose(concat_cond, (0, 2, 3, 1)) \
            if concat_cond is not None else None
        rngs = {'dropout': dropout_key} if dropout_key is not None else {}
        out = self.denoising.apply(params, h, t, concat_cond=cc,
                                   deterministic=deterministic, rngs=rngs)
        return jnp.transpose(out, (0, 3, 1, 2))

    def _x0_from_output(self, x_t, out, sqrt_ab, sqrt_1mab):
        mode = self.denoising_mean_mode.upper()
        if mode == 'EPS':
            return (x_t - sqrt_1mab * out) / sqrt_ab
        if mode == 'START_X':
            return out
        if mode == 'V':
            return sqrt_ab * x_t - sqrt_1mab * out
        raise ValueError(mode)

    def _output_from_x0(self, x_t, x_0, sqrt_ab, sqrt_1mab):
        mode = self.denoising_mean_mode.upper()
        if mode == 'EPS':
            return (x_t - x_0 * sqrt_ab) / sqrt_1mab
        if mode == 'START_X':
            return x_0
        if mode == 'V':
            return (sqrt_ab * x_t - x_0) / sqrt_1mab
        raise ValueError(mode)

    def pred_x_0(self, params, x_t, t, grad_guide_fn=None, guide_state=None,
                 concat_cond=None, cfg=None, update_denoising_output=False,
                 deterministic=True, dropout_key=None, nhwc=False):
        """Predict x_0 from x_t, optionally applying reconstruction guidance
        (gaussian_diffusion.py:180-240).

        grad_guide_fn: callable (x_0_pred, guide_state) -> (loss, new_state);
        its gradient w.r.t. x_t (grad_through_unet) or x_0 steers the
        prediction with the SNR-power-weighted step size.

        Returns (x_0_pred, denoising_output, new_guide_state).
        """
        cfg = cfg or {}
        clip_denoised = cfg.get('clip_denoised', True)
        clip_range = cfg.get('clip_range', [-1, 1])
        guidance_gain = cfg.get('guidance_gain', 1.0)
        grad_through_unet = cfg.get('grad_through_unet', True)
        snr_weight_power = cfg.get('snr_weight_power', 0.5)

        num_batches = x_t.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t), (num_batches,))
        sqrt_ab = _bcast(self.schedule.sqrt_alphas_bar, t, x_t.ndim)
        sqrt_1mab = _bcast(self.schedule.sqrt_one_minus_alphas_bar, t, x_t.ndim)

        def x0_of_xt(x_t_in):
            out = self._apply_unet(params, x_t_in, t, concat_cond,
                                   deterministic, dropout_key, nhwc=nhwc)
            x0 = self._x0_from_output(x_t_in, out, sqrt_ab, sqrt_1mab)
            return x0, out

        new_state = guide_state
        if grad_guide_fn is None:
            x_0_pred, out = x0_of_xt(x_t)
            if clip_denoised:
                x_0_pred = jnp.clip(x_0_pred, *clip_range)
        else:
            if grad_through_unet:
                if cfg.get('guide_remat', False):
                    # Rematerialize the UNet inside the guidance gradient:
                    # the backward pass recomputes the forward instead of
                    # storing every conv/GN activation of the 400M-param
                    # UNet per guided step (SURVEY hard part #3 —
                    # "memory-heavy; needs remat policy").  Costs one extra
                    # forward; cuts guide-step activation memory to the
                    # live set of a single forward.  Measured at flagship
                    # recons1v shapes in tools/guided_bench.py / PERF.md.
                    x0_of_xt = jax.checkpoint(x0_of_xt)

                def loss_of_xt(x_t_in):
                    x0, out = x0_of_xt(x_t_in)
                    if clip_denoised:
                        x0 = jnp.clip(x0, *clip_range)
                    loss, new_state = grad_guide_fn(x0, guide_state)
                    return loss, (x0, out, new_state)

                grad, (x_0_pred, out, new_state) = jax.grad(
                    loss_of_xt, has_aux=True)(x_t)
            else:
                x_0_pred, out = x0_of_xt(x_t)
                if clip_denoised:
                    x_0_pred = jnp.clip(x_0_pred, *clip_range)

                def loss_of_x0(x0):
                    loss, new_state = grad_guide_fn(x0, guide_state)
                    return loss, new_state

                grad, new_state = jax.grad(loss_of_x0, has_aux=True)(x_0_pred)
            x_0_pred = jax.lax.stop_gradient(x_0_pred) - grad * (
                sqrt_1mab ** (2 - snr_weight_power * 2)
                * sqrt_ab ** (snr_weight_power * 2 - 1) * guidance_gain)
            if clip_denoised:
                x_0_pred = jnp.clip(x_0_pred, *clip_range)
            if update_denoising_output:
                out = self._output_from_x0(x_t, x_0_pred, sqrt_ab, sqrt_1mab)
        return x_0_pred, out, new_state

    # ------------------------------------------------------------------ #
    # training loss
    # ------------------------------------------------------------------ #
    def forward_train(self, params, x_0, key, loss_state,
                      concat_cond=None, x_t_detach=False, cfg=None,
                      update_norm=True, deterministic=True, dropout_key=None):
        """One diffusion training loss evaluation.

        Mirrors gaussian_diffusion.py:422-448.  Returns
        (loss, new_loss_state, log_vars).
        """
        num_batches = x_0.shape[0]
        t_key, n_key = jax.random.split(key)
        t = self.timestep_sampler.sample(t_key, num_batches)
        noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
        x_t, mean, std = self.q_sample(x_0, t, noise)
        if x_t_detach:
            x_t = jax.lax.stop_gradient(x_t)
        _, out, _ = self.pred_x_0(
            params, x_t, t, cfg=cfg, update_denoising_output=True,
            deterministic=deterministic, dropout_key=dropout_key)

        mode = self.denoising_mean_mode.upper()
        if mode == 'EPS':
            target = noise
        elif mode == 'START_X':
            target = x_0
        else:  # V
            target = mean * noise - std * x_0
        loss, new_state, log_vars = self.ddpm_loss(
            out, target, t, x_0, state=loss_state, update_norm=update_norm)
        return loss, new_state, log_vars

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #
    def _timestep_seq(self, cfg):
        cfg = cfg or {}
        num = cfg.get('num_timesteps', self.num_timesteps)
        ts = np.arange(self.num_timesteps - 1, -1,
                       -(self.num_timesteps / num)).astype(np.int64)
        t_prev = np.append(ts[1:], -1)
        return ts, t_prev

    def p_sample_ddim(self, params, x_t, t, t_prev, key=None, cfg=None,
                      grad_guide_fn=None, guide_state=None, concat_cond=None,
                      **kwargs):
        """Single DDIM step (gaussian_diffusion.py:264-293). t / t_prev may
        be traced scalars; t_prev == -1 selects alpha_bar_prev[0] == 1."""
        cfg = cfg or {}
        eta = cfg.get('eta', 0)
        ab = jnp.asarray(self.schedule.alphas_bar, jnp.float32)
        alpha_bar_t_prev = jnp.where(t_prev >= 0, ab[jnp.maximum(t_prev, 0)], 1.0)
        tilde_beta_t = jnp.asarray(self.schedule.tilde_betas_t, jnp.float32)[t]

        x_0_pred, _, guide_state = self.pred_x_0(
            params, x_t, t, grad_guide_fn=grad_guide_fn,
            guide_state=guide_state, concat_cond=concat_cond, cfg=cfg, **kwargs)
        sqrt_ab = _bcast(self.schedule.sqrt_alphas_bar, t, x_t.ndim)
        sqrt_1mab = _bcast(self.schedule.sqrt_one_minus_alphas_bar, t, x_t.ndim)
        eps_t_pred = (x_t - sqrt_ab * x_0_pred) / sqrt_1mab
        dir_coef = jnp.sqrt(1 - alpha_bar_t_prev - tilde_beta_t * (eta ** 2))
        x_prev = jnp.sqrt(alpha_bar_t_prev) * x_0_pred + dir_coef * eps_t_pred
        if eta > 0:
            noise = jax.random.normal(key, x_t.shape, x_t.dtype)
            x_prev = x_prev + eta * jnp.sqrt(tilde_beta_t) * noise
        return x_prev, x_0_pred, guide_state

    def p_sample_langevin(self, params, x_t, t, key, cfg=None,
                          grad_guide_fn=None, guide_state=None, **kwargs):
        cfg = cfg or {}
        delta = cfg.get('langevin_delta', 0.1)
        sigma = _bcast(self.schedule.sqrt_one_minus_alphas_bar, t, x_t.ndim)
        sqrt_ab = _bcast(self.schedule.sqrt_alphas_bar, t, x_t.ndim)
        x_0_pred, _, guide_state = self.pred_x_0(
            params, x_t, t, grad_guide_fn=grad_guide_fn,
            guide_state=guide_state, cfg=cfg, **kwargs)
        eps_t_pred = (x_t - sqrt_ab * x_0_pred) / sigma
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        return (x_t - 0.5 * delta * sigma * eps_t_pred
                + math.sqrt(delta) * sigma * noise), guide_state

    def _to_nhwc_chain(self, noise, concat_cond, grad_guide_fn):
        """Move the sampling chain to NHWC residency: the UNet is NHWC
        internally, and NCHW<->NHWC relayouts of the (B, 18, H, W) code
        cost ~1 ms each on TPU (18-channel minor dim pads to 128 lanes).
        The chain transposes once at entry/exit instead of twice per step;
        guide callbacks still see the public NCHW layout."""
        noise = jnp.transpose(noise, (0, 2, 3, 1))
        if concat_cond is not None:
            concat_cond = jnp.transpose(concat_cond, (0, 1, 3, 4, 2))
        if grad_guide_fn is not None:
            inner = grad_guide_fn

            def grad_guide_fn(x0, gstate):
                return inner(jnp.transpose(x0, (0, 3, 1, 2)), gstate)
        return noise, concat_cond, grad_guide_fn

    def ddim_sample(self, params, noise, key, cfg=None, concat_cond=None,
                    grad_guide_fn=None, guide_state=None,
                    save_intermediates=False, **kwargs):
        """Full DDIM chain as a lax.scan (gaussian_diffusion.py:295-331),
        with optional interleaved Langevin correction steps.  The chain
        runs NHWC-resident (see _to_nhwc_chain); inputs and outputs keep
        the public NCHW code_diff_pr layout."""
        cfg = cfg or {}
        noise, concat_cond, grad_guide_fn = self._to_nhwc_chain(
            noise, concat_cond, grad_guide_fn)
        kwargs['nhwc'] = True
        ts, t_prevs = self._timestep_seq(cfg)
        langevin_steps = cfg.get('langevin_steps', 0)
        lo, hi = cfg.get('langevin_t_range', [0, 1000])
        num_cond = concat_cond.shape[1] if concat_cond is not None else 1
        calls_per_step = 1 + langevin_steps
        cond_idx = (np.arange(len(ts) * calls_per_step) % num_cond).reshape(
            len(ts), calls_per_step)
        langevin_on = np.array(
            [(langevin_steps > 0) and (lo < tp < hi) for tp in t_prevs])

        in_dtype = noise.dtype  # keep the scan carry dtype under autocast

        # Per-step keys are precomputed OUTSIDE the scan and streamed in as
        # scan inputs.  Threading the key through the carry (split inside
        # the body) composes catastrophically with the rest of the step on
        # TPU: measured +1.7 ms/step f32 / +5.4 ms/step bf16 on the
        # flagship UNet scan — 25-53% of the whole step — while the
        # identical computation with streamed keys runs at the UNet-only
        # bound (PERF.md round 5, tools jobs 02-04).  XLA's while-loop
        # buffer handling of small mixed-dtype carries is the culprit, not
        # the threefry FLOPs (a carried f32 scalar alone triples the step).
        step_keys = jax.random.split(
            key, len(ts) * (1 + langevin_steps)).reshape(
            len(ts), 1 + langevin_steps, 2)

        def body(carry, xs):
            x_t, gstate = carry
            t, t_prev, ci, lang_on, keys = xs
            cc = concat_cond[:, ci[0]] if concat_cond is not None else None
            x_t, x_0_pred, gstate = self.p_sample_ddim(
                params, x_t, t, t_prev, key=keys[0], cfg=cfg,
                grad_guide_fn=grad_guide_fn, guide_state=gstate,
                concat_cond=cc, **kwargs)
            x_t = x_t.astype(in_dtype)

            if langevin_steps > 0:
                def lang_body(i, val):
                    x, gs = val
                    ccl = concat_cond[:, ci[1 + i]] \
                        if concat_cond is not None else None
                    x_new, gs_new = self.p_sample_langevin(
                        params, x, jnp.maximum(t_prev, 0), keys[1 + i],
                        cfg=cfg, grad_guide_fn=grad_guide_fn,
                        guide_state=gs, concat_cond=ccl, **kwargs)
                    keep = lang_on
                    x = jnp.where(keep, x_new, x).astype(in_dtype)
                    gs = jax.tree_util.tree_map(
                        lambda a, b: jnp.where(keep, a, b), gs_new, gs) \
                        if gs is not None else None
                    return (x, gs)

                x_t, gstate = jax.lax.fori_loop(
                    0, langevin_steps, lang_body, (x_t, gstate))
            out = (x_0_pred, x_t) if save_intermediates else None
            return (x_t, gstate), out

        xs = (jnp.asarray(ts), jnp.asarray(t_prevs), jnp.asarray(cond_idx),
              jnp.asarray(langevin_on), step_keys)
        (x_final, guide_state), saved = jax.lax.scan(
            body, (noise, guide_state), xs)
        if save_intermediates:
            saved = jax.tree_util.tree_map(
                lambda a: jnp.transpose(a, (0, 1, 4, 2, 3)), saved)
            return saved, guide_state
        return jnp.transpose(x_final, (0, 3, 1, 2)), guide_state

    def p_sample_ddpm(self, params, x_t, t, key, cfg=None, grad_guide_fn=None,
                      guide_state=None, concat_cond=None, **kwargs):
        """Single ancestral DDPM step (gaussian_diffusion.py:333-365)."""
        cfg = cfg or {}
        if self.denoising_var_mode.upper() == 'FIXED_LARGE':
            var_arr = np.append(self.schedule.tilde_betas_t[1],
                                self.schedule.betas)
        elif self.denoising_var_mode.upper() == 'FIXED_SMALL':
            var_arr = self.schedule.tilde_betas_t
        else:
            raise ValueError(self.denoising_var_mode)
        var = _bcast(var_arr, t, x_t.ndim)
        x_0_pred, _, guide_state = self.pred_x_0(
            params, x_t, t, grad_guide_fn=grad_guide_fn,
            guide_state=guide_state, concat_cond=concat_cond, cfg=cfg, **kwargs)
        coef1 = _bcast(self.schedule.tilde_mu_t_coef1, t, x_t.ndim)
        coef2 = _bcast(self.schedule.tilde_mu_t_coef2, t, x_t.ndim)
        mean_pred = coef1 * x_0_pred + coef2 * x_t
        noise = jax.random.normal(key, x_t.shape, x_t.dtype)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (-1,) + (1,) * (x_t.ndim - 1))
        return mean_pred + nonzero * jnp.sqrt(var) * noise, x_0_pred, guide_state

    def ddpm_sample(self, params, noise, key, cfg=None, concat_cond=None,
                    grad_guide_fn=None, guide_state=None, **kwargs):
        cfg = cfg or {}
        noise, concat_cond, grad_guide_fn = self._to_nhwc_chain(
            noise, concat_cond, grad_guide_fn)
        kwargs['nhwc'] = True
        ts, _ = self._timestep_seq(cfg)
        num_cond = concat_cond.shape[1] if concat_cond is not None else 1
        cond_idx = np.arange(len(ts)) % num_cond

        # keys streamed in as scan inputs, not carried (see ddim_sample)
        step_keys = jax.random.split(key, len(ts))

        def body(carry, xs):
            x_t, gstate = carry
            t, ci, k1 = xs
            cc = concat_cond[:, ci] if concat_cond is not None else None
            x_t, _, gstate = self.p_sample_ddpm(
                params, x_t, t, k1, cfg=cfg, grad_guide_fn=grad_guide_fn,
                guide_state=gstate, concat_cond=cc, **kwargs)
            return (x_t.astype(noise.dtype), gstate), None

        (x_final, guide_state), _ = jax.lax.scan(
            body, (noise, guide_state),
            (jnp.asarray(ts), jnp.asarray(cond_idx), step_keys))
        return jnp.transpose(x_final, (0, 3, 1, 2)), guide_state

    def sample_from_noise(self, params, noise, key, **kwargs):
        fn = {'ddim': self.ddim_sample, 'ddpm': self.ddpm_sample}[
            self.sample_method.lower()]
        return fn(params, noise, key, **kwargs)
