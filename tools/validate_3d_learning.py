"""3D-learning validation (run on TPU): stage-1 auto-decoding of
analytic view-consistent sphere scenes must overfit training views and
generalize to held-out views.  Measured on v5e (round 1): train PSNR
36.8 dB @ 300 iters, held-out novel-view PSNR 20.7 dB (5 training views).
"""
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
from ssdnerf_tpu.core.metrics import eval_psnr

base = Config.fromfile(_repo + '/configs/paper_cfgs/stage1_cars_recons16v.py')
tc = dict(base.train_cfg, extra_scene_step=3, n_inverse_rays=4096,
          n_decoder_rays=4096, loss_coef=0.1/(64*64))
tc.pop('cache_load_from', None)
model = build_model(dict(base.model, cache_size=4), train_cfg=tc,
                    test_cfg=dict(base.test_cfg))
S, V = 4, 6
data_np = make_sphere_batch(num_scenes=S, num_views=V, h=64, w=64)
# hold out the last view per scene
data = dict(
    cond_imgs=jnp.asarray(data_np['cond_imgs'][:, :V-1]),
    cond_poses=jnp.asarray(data_np['cond_poses'][:, :V-1]),
    cond_intrinsics=jnp.asarray(data_np['cond_intrinsics'][:, :V-1]))
opt_cfg = dict(type='Adam', lr=1e-3)
state = model.init_state(jax.random.PRNGKey(0), opt_cfg)
tx = model.make_optimizer(opt_cfg, None, 'decoder')
rng = np.random.RandomState(0)
code_ = jnp.asarray(model.get_init_code_np(S, rng))
batch = dict(code_=code_, opt=adam_init(code_),
             density_grid=jnp.zeros((S, 64**3), jnp.float16),
             density_bitfield=jnp.full((S, 64**3 // 8), 255, jnp.uint8))
step = jax.jit(lambda s,b,d,k: model.train_step(s,b,d,k,tx))
t0 = time.time()
for i in range(301):
    state, batch, logs = step(state, batch, data, jax.random.fold_in(jax.random.PRNGKey(1), i))
    if i % 50 == 0:
        print('iter %d train_psnr=%.2f pixel_loss=%.4f (%.2f it/s)' % (
            i, float(logs['train_psnr']), float(logs['pixel_loss']),
            (i+1)/(time.time()-t0)), flush=True)
# held-out view PSNR
code = model.code_activation(batch['code_'], state['code_act'])
img, _ = model.render(state, code, batch['density_bitfield'], 64, 64,
                      jnp.asarray(data_np['cond_intrinsics'][:, V-1:]),
                      jnp.asarray(data_np['cond_poses'][:, V-1:]),
                      decoder_params=state['decoder'])
gt = jnp.asarray(data_np['cond_imgs'][:, V-1:])
p = eval_psnr(jnp.clip(img, 0, 1).reshape(S, -1), gt.reshape(S, -1))
print('HELD-OUT view PSNR per scene:', [round(float(x), 2) for x in p], flush=True)
print('MEAN HELD-OUT PSNR: %.2f dB' % float(p.mean()), flush=True)
