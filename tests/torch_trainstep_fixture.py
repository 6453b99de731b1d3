"""Torch transcription of the reference's COMPOSED single-stage train step.

Transcribes the end-to-end training math of the reference — not our JAX
code — so that a composed-step error (a sign-flipped loss weight, a wrong
Adam bias-correction placement, a missed prior-grad accumulation) that
passes every module-level parity test still fails here:

- q_sample + V-target + timestep-weighted MSE + running scale_norm
  (/root/reference/lib/models/diffusions/gaussian_diffusion.py:404-448,
  lib/models/losses/ddpm_loss.py:80-128),
- the prior-grad trick: the diffusion backward leaves grads on the raw
  codes, and the decoder backward ADDS to them before the joint
  decoder/code Adam steps
  (/root/reference/lib/models/autodecoders/diffusion_nerf.py:66-189),
- the density-grid EMA-max update + bitfield repack
  (lib/models/autodecoders/base_nerf.py:328-389),
- the ray-batch rendering loss with loss_coef pixel scaling
  (base_nerf.py:276-296) on a from-scratch torch volume renderer
  (iterative t-recurrence and multiplicative transmittance, deliberately
  NOT the closed-form/exp-sum formulation the JAX renderer uses).

Randomness (timesteps, noise, ray indices, jitters) is injected as explicit
arrays so both implementations consume identical draws.

Only a test fixture; nothing imports this outside tests.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

SQRT3 = float(np.sqrt(3.0))


# --------------------------------------------------------------------- #
# code activation + diffusion-side reshape
# --------------------------------------------------------------------- #
def tanh_code(code_, scale):
    """TanhCode (base_nerf.py:26-38)."""
    return torch.tanh(code_) * scale


def code_diff_pr(code, code_reshape):
    """diffusion_nerf.py:48-56 (reshape only; no permute in the tiny cfg)."""
    return code.reshape((code.shape[0],) + tuple(code_reshape))


# --------------------------------------------------------------------- #
# diffusion loss (q_sample + V target + weighted MSE + scale_norm)
# --------------------------------------------------------------------- #
def diffusion_loss(unet, code_diff, t, noise, sqrt_ab, sqrt_1mab,
                   weight, weight_scale, norm_factor, momentum):
    """gaussian_diffusion.py:404-448 + ddpm_loss.py:80-128.

    Returns (loss, new_norm_factor).  ``norm_factor`` is the running
    scale-norm EMA buffer (a python float); the reference updates the
    buffer FIRST and divides by the updated value.
    """
    shape = (-1,) + (1,) * (code_diff.ndim - 1)
    mean = sqrt_ab[t].reshape(shape)
    std = sqrt_1mab[t].reshape(shape)
    x_t = mean * code_diff + std * noise          # q_sample
    v_pred = unet(x_t, t)
    v_target = mean * noise - std * code_diff
    # mse_loss(reduction='flatmean') * 0.5, then timestep_weight rescale
    per_sample = 0.5 * ((v_pred - v_target) ** 2).flatten(1).mean(-1)
    per_sample = per_sample * weight[t] * weight_scale
    loss = per_sample.mean()
    # norm_factor[:] = (1-m)*norm + m*E[x_0^2].detach(); loss /= norm_factor
    new_norm = (1 - momentum) * norm_factor \
        + momentum * float(code_diff.detach().square().mean())
    return loss / new_norm, new_norm


# --------------------------------------------------------------------- #
# triplane decoder (grid_sample bilinear + tiny MLPs), torch-native
# --------------------------------------------------------------------- #
def sh_encode_deg4(dirs):
    """Real SH basis, degrees 0..3 (16 coeffs) — torch-ngp shencoder
    convention (the constants the reference's CUDA sh_encode uses)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return torch.stack([
        torch.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ], dim=-1)


class TorchTriplaneDecoder(nn.Module):
    """TriPlaneDecoder forward (triplane_decoder.py:104-179) with
    F.grid_sample doing the bilinear lookups (border, align_corners=False)
    — an independent implementation of the sampling our MXU hat
    contraction replaces."""

    def __init__(self, C=4, hidden=32, sigmoid_saturation=0.001):
        super().__init__()
        self.base_net = nn.Linear(3 * C, hidden)
        self.density_net = nn.Linear(hidden, 1)
        self.dir_net = nn.Linear(16, hidden)
        self.color_net = nn.Linear(hidden, 3)
        self.sigmoid_saturation = sigmoid_saturation

    def point_decode(self, code, xyz, dirs=None):
        """code (S, 3, C, H, W); xyz (S, N, 3) in [-1,1]; dirs (S, N, 3)."""
        S, _, C, H, W = code.shape
        # plane projections (xy, xz, yz); grid coords order (x=W, y=H)
        coords = torch.stack(
            [xyz[..., [0, 1]], xyz[..., [0, 2]], xyz[..., [1, 2]]],
            dim=1)                                   # (S, 3, N, 2)
        feats = F.grid_sample(
            code.reshape(S * 3, C, H, W),
            coords.reshape(S * 3, 1, -1, 2),
            mode='bilinear', padding_mode='border', align_corners=False,
        ).reshape(S, 3, C, -1)                       # (S, 3, C, N)
        # plane-major feature order: column f*3 + p (triplane_decoder.py:141)
        feats = feats.permute(0, 3, 2, 1).reshape(S, -1, C * 3)
        base_x = self.base_net(feats)
        base_act = F.silu(base_x)
        sigmas = trunc_exp(self.density_net(base_act).squeeze(-1))
        rgbs = None
        if dirs is not None:
            sh = sh_encode_deg4(dirs)
            color_in = F.silu(base_x + self.dir_net(sh))
            rgbs = torch.sigmoid(self.color_net(color_in))
            if self.sigmoid_saturation > 0:
                rgbs = rgbs * (1 + self.sigmoid_saturation * 2) \
                    - self.sigmoid_saturation
        return sigmas, rgbs


class _TruncExp(torch.autograd.Function):
    @staticmethod
    def forward(ctx, x):
        ctx.save_for_backward(x)
        return torch.exp(x)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        return g * torch.exp(x.clamp(max=15.0))


def trunc_exp(x):
    return _TruncExp.apply(x)


# --------------------------------------------------------------------- #
# volume renderer (iterative transcription of raymarching.cu semantics)
# --------------------------------------------------------------------- #
def near_far_from_aabb(rays_o, rays_d, bound, min_near=0.2):
    """raymarching.cu kernel_near_far_from_aabb (slab method)."""
    inv = 1.0 / rays_d
    t_lo = (-bound - rays_o) * inv
    t_hi = (bound - rays_o) * inv
    tmin = torch.minimum(t_lo, t_hi).amax(-1)
    tmax = torch.maximum(t_lo, t_hi).amin(-1)
    miss = tmax < tmin
    nears = torch.where(miss, torch.full_like(tmin, 1e10),
                        tmin.clamp(min=min_near))
    fars = torch.where(miss, torch.full_like(tmax, 1e10), tmax)
    return nears, fars


def torch_volume_render(decoder, code, rays_o, rays_d, bitfield, grid_size,
                        dt_gamma, max_steps, perturb_noise, T_thresh=1e-4,
                        bound=1.0, min_near=0.2):
    """Dense-grid render: ITERATIVE t recurrence (t += clamp(t*gamma,
    dt_min, dt_max), raymarching.cu:311-492) + multiplicative transmittance
    T *= 1 - alpha (raymarching.cu:502-570).  Returns (S, N, 3) rgb with
    white background, plus weights_sum."""
    S, N, _ = rays_o.shape
    H = grid_size
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 / H
    nears, fars = near_far_from_aabb(rays_o, rays_d, bound, min_near)

    t = nears + torch.clamp(nears * dt_gamma[:, None], dt_min, dt_max) \
        * perturb_noise
    ts, dts = [], []
    for _ in range(max_steps):
        dt = torch.clamp(t * dt_gamma[:, None], dt_min, dt_max)
        ts.append(t)
        dts.append(dt)
        t = t + dt
    ts = torch.stack(ts, -1)                          # (S, N, K)
    dts = torch.stack(dts, -1)

    xyz = torch.clamp(rays_o[:, :, None] + ts[..., None] * rays_d[:, :, None],
                      -bound, bound)
    n = ((xyz / bound + 1.0) * (0.5 * H)).long().clamp(0, H - 1)
    idx = (n[..., 0] * H + n[..., 1]) * H + n[..., 2]  # linear (x,y,z) order
    byte = torch.gather(
        bitfield.long(), 1, (idx >> 3).reshape(S, -1)).reshape(idx.shape)
    occ = ((byte >> (idx & 7)) & 1).bool()
    valid = occ & (ts < fars[..., None])

    dirs = rays_d[:, :, None].expand(-1, -1, max_steps, -1).reshape(S, -1, 3)
    sigmas, rgbs = decoder.point_decode(
        code, xyz.reshape(S, -1, 3), dirs)
    sigmas = sigmas.reshape(S, N, max_steps)
    rgbs = rgbs.reshape(S, N, max_steps, 3)

    alpha = 1.0 - torch.exp(-torch.where(valid, sigmas * dts,
                                         torch.zeros_like(sigmas)))
    # iterative exclusive transmittance with the T_thresh cutoff applied to
    # the pre-update T (the CUDA loop breaks BEFORE compositing a sample
    # once T < T_thresh)
    T = torch.ones_like(alpha[..., 0])
    weights = []
    for k in range(max_steps):
        alive = (T.detach() >= T_thresh)
        w = torch.where(valid[..., k] & alive, alpha[..., k] * T,
                        torch.zeros_like(T))
        weights.append(w)
        T = T * (1.0 - torch.where(valid[..., k] & alive, alpha[..., k],
                                   torch.zeros_like(T)))
    weights = torch.stack(weights, -1)
    weights_sum = weights.sum(-1)
    image = (weights[..., None] * rgbs).sum(-2)
    return image, weights_sum


# --------------------------------------------------------------------- #
# density grid update (base_nerf.py:328-389)
# --------------------------------------------------------------------- #
def torch_update_density(decoder, code, density_grid, jitter, grid_size,
                         density_thresh, bound=1.0, decay=0.9):
    """Full sweep: density at every voxel center (+ given jitter), EMA-max
    merge, threshold min(mean, density_thresh), linear-order packbits."""
    H = grid_size
    S = code.shape[0]
    lin = torch.arange(H ** 3)
    coords = torch.stack([lin // (H * H), (lin // H) % H, lin % H], -1)
    xyzs = (coords.float() - (H - 1) / 2.0) * (2.0 * bound / H) + jitter
    with torch.no_grad():
        tmp, _ = decoder.point_decode(
            code, xyzs[None].expand(S, -1, -1), None)
    valid = density_grid >= 0
    density_grid = torch.where(valid, torch.maximum(density_grid * decay, tmp),
                               density_grid)
    mean_density = density_grid.clamp(min=0).mean()
    thresh = torch.minimum(mean_density, torch.tensor(float(density_thresh)))
    bits = (density_grid > thresh).reshape(S, -1, 8)
    weights = (1 << torch.arange(8)).to(torch.uint8)
    bitfield = (bits.to(torch.uint8) * weights).sum(-1).to(torch.uint8)
    return density_grid, bitfield


# --------------------------------------------------------------------- #
# the inner scene loop (base_nerf.py:403-492 inverse_code, driven with the
# prior grad by diffusion_nerf.py:128-158)
# --------------------------------------------------------------------- #
def torch_inverse_code(decoder, code_, opt_code, prior_grad, inner_rand,
                       batch, cfg, update_extra_interval):
    """``extra_scene_step`` inner code-optimization steps.

    Each step: (density update at step % interval == 0) -> ray-batch
    rendering loss -> ``code_.grad.copy_(prior_grad)`` then backward (the
    reference's accumulation surgery, diffusion_nerf.py:128-137) -> Adam.
    ``inner_rand`` is a list of per-step dicts with ``density_jitter``,
    ``ray_inds`` (S, n_rays), ``perturb`` (S, n_rays); bitfield/grid live
    in ``batch`` and update in place."""
    tc = cfg
    scale = tc['code_scale']
    grid_size = tc['grid_size']
    S = code_.shape[0]
    logs = {}
    code_grads = []
    for i, rand in enumerate(inner_rand):
        if i % update_extra_interval == 0:
            code = tanh_code(code_.detach(), scale)
            batch['density_grid'], batch['bitfield'] = torch_update_density(
                decoder, code, batch['density_grid'],
                rand['density_jitter'], grid_size, tc['density_thresh'])
        take = lambda a: torch.gather(
            a.reshape(S, -1, 3), 1,
            rand['ray_inds'][..., None].expand(-1, -1, 3))
        rays_o = take(batch['rays_o'])
        rays_d = take(batch['rays_d'])
        target = take(batch['imgs'])

        code = tanh_code(code_, scale)
        image, wsum = torch_volume_render(
            decoder, code, rays_o, rays_d, batch['bitfield'], grid_size,
            batch['dt_gamma'], tc['max_steps'], rand['perturb'])
        out_rgbs = image + tc['bg_color'] * (1 - wsum[..., None])
        pscale = 1 - np.exp(-tc['loss_coef'] * batch['num_pixels'])
        pixel_loss = ((out_rgbs - target) ** 2).mean() \
            * tc['pixel_loss_weight'] * (pscale * 3)
        reg_loss = (code.abs() ** 2).mean() * tc['reg_loss_weight']
        loss = pixel_loss + reg_loss
        code_.grad = prior_grad.clone()
        loss.backward()
        code_grads.append(code_.grad.detach().clone())
        opt_code.step()
        logs = dict(inner_pixel_loss=float(pixel_loss),
                    inner_reg_loss=float(reg_loss), inner_loss=float(loss))
    logs['code_grads'] = code_grads
    return logs


# --------------------------------------------------------------------- #
# the composed step (diffusion_nerf.py:66-189; extra_scene_step > 0 runs
# the inner loop above between the diffusion and the final joint step)
# --------------------------------------------------------------------- #
def torch_train_step(unet, decoder, code_, opt_diffusion, opt_decoder,
                     opt_code, sched, rand, batch, cfg,
                     inner_rand=None, update_extra_interval=16):
    """One single-stage train step.  ``rand`` carries the pre-drawn
    randomness: t (S,), noise (like code_diff), density_jitter (H^3, 3),
    ray_inds (S, n_rays), perturb (S, n_rays).  ``sched`` carries the
    diffusion schedule tables + sampler weights + the scale-norm state.
    ``inner_rand`` (optional) carries one dict per extra_scene_step.
    Returns a dict of losses/logs; parameters and code_ update in place."""
    tc = cfg
    scale = tc['code_scale']
    grid_size = tc['grid_size']

    code_.grad = None
    opt_diffusion.zero_grad(set_to_none=True)
    opt_decoder.zero_grad(set_to_none=True)

    code = tanh_code(code_, scale)
    code_diff = code_diff_pr(code, tc['code_reshape'])
    loss_diff, new_norm = diffusion_loss(
        unet, code_diff, rand['t'], rand['noise'],
        sched['sqrt_ab'], sched['sqrt_1mab'], sched['weight'],
        sched['weight_scale'], sched['norm_factor'], sched['momentum'])
    loss_diff.backward()
    opt_diffusion.step()
    sched['norm_factor'] = new_norm
    # code_.grad now holds the prior grad (kept; decoder backward adds)

    inner_logs = {}
    if inner_rand:
        prior_grad = code_.grad.detach().clone()
        inner_logs = torch_inverse_code(
            decoder, code_, opt_code, prior_grad, inner_rand, batch, cfg,
            update_extra_interval)
        # final joint step re-injects the SAME prior grad
        # (diffusion_nerf.py:168: g_code = g_code + prior_grad)
        code_.grad = prior_grad.clone()

    # density update on the re-activated code (graph-free)
    code = tanh_code(code_.detach(), scale)
    density_grid, bitfield = torch_update_density(
        decoder, code, batch['density_grid'], rand['density_jitter'],
        grid_size, tc['density_thresh'])
    batch['density_grid'] = density_grid

    # ray batch + rendering loss
    S = code_.shape[0]
    take = lambda a: torch.gather(
        a.reshape(S, -1, 3), 1,
        rand['ray_inds'][..., None].expand(-1, -1, 3))
    rays_o = take(batch['rays_o'])
    rays_d = take(batch['rays_d'])
    target = take(batch['imgs'])

    code = tanh_code(code_, scale)
    image, wsum = torch_volume_render(
        decoder, code, rays_o, rays_d, bitfield, grid_size,
        batch['dt_gamma'], tc['max_steps'], rand['perturb'])
    out_rgbs = image + tc['bg_color'] * (1 - wsum[..., None])
    num_pixels = batch['num_pixels']
    pscale = 1 - np.exp(-tc['loss_coef'] * num_pixels)
    pixel_loss = ((out_rgbs - target) ** 2).mean() \
        * tc['pixel_loss_weight'] * (pscale * 3)
    reg_loss = (code.abs() ** 2).mean() * tc['reg_loss_weight']
    loss_dec = pixel_loss + reg_loss
    loss_dec.backward()          # ADDS render grads onto the prior grad
    code_grad = code_.grad.detach().clone()
    opt_decoder.step()
    opt_code.step()

    mse = ((out_rgbs.detach() - target) ** 2).flatten(1).mean(-1)
    psnr = float((-10.0 * torch.log10(mse)).mean())
    return dict(loss_diffusion=float(loss_diff),
                loss_decoder=float(loss_dec),
                pixel_loss=float(pixel_loss), reg_loss=float(reg_loss),
                train_psnr=psnr, bitfield=bitfield, code_grad=code_grad,
                **inner_logs)
