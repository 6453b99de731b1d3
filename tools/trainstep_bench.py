#!/usr/bin/env python
"""Flagship train-step wall-clock at a given extra_scene_step (ess).

Measures the real jitted DiffusionNeRF train_step (UNet fwd+bwd, ess+1
inner render-grad steps, density updates, vectorized Adam) at flagship
shapes on the TPU, with donation, over 10 sequential steps.  Run via
tools/ess_sweep.sh for the ModelUpdater schedule points (ess 15/3/1,
packed renderer on/off) — VERDICT r2 item #7.

Usage: python tools/trainstep_bench.py [ess] [pack]
"""
import os, sys, time
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', os.path.expanduser('~/.cache/jax_comp_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from ssdnerf_tpu.models.autodecoders.base import adam_init
from synthetic import make_batch
from ssdnerf_tpu.core.timing import measure_rtt
RTT = measure_rtt()  # per-run measured dispatch+readback cost

ess = int(sys.argv[1]) if len(sys.argv) > 1 else 15
pack = len(sys.argv) > 2 and sys.argv[2] == 'pack'

base = Config.fromfile('/root/repo/configs/paper_cfgs/ssdnerf_cars_uncond.py')
tc = dict(base.train_cfg, extra_scene_step=ess)
tc.pop('cache_load_from', None)
model = build_model(dict(base.model, cache_size=8), train_cfg=tc,
                    test_cfg=dict(base.test_cfg))
if pack:
    model.set_dotted('decoder.pack_slots', 512)
    model.set_dotted('decoder.march_slots', 128)
S, V = 8, 4
data_np = make_batch(num_scenes=S, num_views=V, h=128, w=128)
data = {k: jnp.asarray(v) for k, v in data_np.items() if k != 'scene_name'}
opt_cfgs = dict(diffusion=dict(type='Adam', lr=1e-4), decoder=dict(type='Adam', lr=1e-3))
state = model.init_state(jax.random.PRNGKey(0), opt_cfgs)
tx_d = model.make_optimizer(opt_cfgs['diffusion'], None, 'x')
tx_dec = model.make_optimizer(opt_cfgs['decoder'], None, 'x')
rng = np.random.RandomState(0)
code_ = jnp.asarray(model.get_init_code_np(S, rng))
# pruned-ish occupancy so march_slots is exact when enabled (~blob)
H = 64
ax = np.linspace(-1, 1, H)
X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
occ = ((X/0.9)**2 + (Y/0.45)**2 + (Z/0.6)**2) < 1.0
from ssdnerf_tpu.ops.morton import packbits
bf = packbits(jnp.broadcast_to(jnp.asarray(occ.reshape(-1), jnp.float32), (S, H**3)), 0.5)
grid = jnp.where(jnp.asarray(occ.reshape(-1))[None], 0.5, 0.0).astype(jnp.float16)
grid = jnp.broadcast_to(grid, (S, H**3))
batch = dict(code_=code_, opt=adam_init(code_),
             density_grid=grid, density_bitfield=bf)
step = jax.jit(lambda s,b,d,k: model.train_step(s,b,d,k,tx_d,tx_dec), donate_argnums=(0,1))

k0 = jax.random.PRNGKey(1)
state, batch, logs = step(state, batch, data, k0)
_ = float(logs['loss_diffusion'])
n = 10
t0 = time.perf_counter()
for i in range(n):
    state, batch, logs = step(state, batch, data, jax.random.fold_in(k0, i))
_ = float(logs['loss_diffusion'])
dt = (time.perf_counter() - t0 - RTT) / n
print(f'train_step ess={ess} pack={pack}: {dt*1e3:.1f} ms/step = {1/dt:.2f} it/s', flush=True)
