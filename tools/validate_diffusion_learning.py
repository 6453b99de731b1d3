"""Single-stage DiffusionNeRF on view-consistent sphere scenes: validates
that the diffusion prior learns the code distribution (unconditional DDIM
samples should render to sphere-like objects)."""
import os, sys, time
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo); sys.path.insert(0, os.path.join(_repo, 'tests'))
import jax
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
import numpy as np, jax.numpy as jnp
from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from synthetic import make_sphere_batch
from ssdnerf_tpu.models.autodecoders.base import adam_init
from ssdnerf_tpu.runner.hooks import EMAHook

base = Config.fromfile(_repo + '/configs/paper_cfgs/ssdnerf_cars_uncond.py')
tc = dict(base.train_cfg, extra_scene_step=3, loss_coef=0.1/(64*64))
tc.pop('cache_load_from', None)
S, V = 8, 6
model = build_model(dict(base.model, cache_size=S), train_cfg=tc,
                    test_cfg=dict(base.test_cfg, num_timesteps=20))
data_np = make_sphere_batch(num_scenes=S, num_views=V, h=64, w=64)
data = {k: jnp.asarray(v) for k, v in data_np.items() if k != 'scene_name'}
opt_cfgs = dict(diffusion=dict(type='Adam', lr=2e-4), decoder=dict(type='Adam', lr=1e-3))
state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
tx_d = model.make_optimizer(opt_cfgs['diffusion'], None, 'x')
tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'x')
rng = np.random.RandomState(0)
code_ = jnp.asarray(model.get_init_code_np(S, rng))
batch = dict(code_=code_, opt=adam_init(code_),
             density_grid=jnp.zeros((S, 64**3), jnp.float16),
             density_bitfield=jnp.full((S, 64**3 // 8), 255, jnp.uint8))
step = jax.jit(lambda s,b,d,k: model.train_step(s,b,d,k,tx_d,tx_dec))

class R:  # minimal runner stub for the EMA hook
    iteration = 0
ema = EMAHook(momentum_cfg=dict(ema_kimg=4, ema_rampup=0.05, batch_size=S))
r = R(); r.state = state
t0 = time.time()
N_IT = 800
for i in range(N_IT):
    r.state, batch, logs = step(r.state, batch, data,
                                jax.random.fold_in(jax.random.PRNGKey(1), i))
    r.iteration = i + 1
    ema.after_train_iter(r)
    if i % 100 == 0:
        print('iter %d psnr=%.2f ddpm=%.4f diff=%.4f (%.2f it/s)' % (
            i, float(logs['train_psnr']), float(logs['loss_ddpm_mse']),
            float(logs['loss_diffusion']), (i+1)/(time.time()-t0)), flush=True)
state = r.state

# training-code stats
code_train = model.code_activation(batch['code_'], state['code_act'])
print('train code rms: %.3f' % float(jnp.sqrt(jnp.mean(code_train**2))), flush=True)

# unconditional DDIM sample + render
noise = jax.random.normal(jax.random.PRNGKey(7), (4,) + model.code_size)
code_s, grid_s, bf_s = model.val_uncond(state, noise, jax.random.PRNGKey(8))
print('sample code rms: %.3f' % float(jnp.sqrt(jnp.mean(code_s**2))), flush=True)
img, _ = model.render(state, code_s, bf_s, 64, 64,
                      jnp.asarray(data_np['cond_intrinsics'][:4, :1]),
                      jnp.asarray(data_np['cond_poses'][:4, :1]))
img = np.clip(np.asarray(img), 0, 1)
# object fraction: pixels that deviate from the white bg
obj_frac = (np.abs(img - 1.0).max(-1) > 0.15).mean(axis=(1,2,3))
print('sampled object fraction per scene:', [round(float(f),3) for f in obj_frac], flush=True)
train_frac = (np.abs(data_np['cond_imgs'][:, 0] - 1.0).max(-1) > 0.15).mean()
print('training object fraction: %.3f' % train_frac, flush=True)
import imageio
imageio.imwrite('/tmp/diff_samples.png',
                (np.concatenate(list(img[:, 0]), axis=1) * 255).astype(np.uint8))
print('wrote /tmp/diff_samples.png', flush=True)
