"""Quick A/B timing of renderer variants at bench shapes on the real TPU.

Usage: python tools/render_variants_bench.py [uniform|pruned] [variants...]
Variants: xla, pallas, banded (default: pallas banded).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssdnerf_tpu.config import Config
from ssdnerf_tpu.registry import build_model
from ssdnerf_tpu.models.decoders.renderer import volume_render
from ssdnerf_tpu.ops import get_cam_rays
from ssdnerf_tpu.ops.morton import packbits
from ssdnerf_tpu.core.timing import measure_rtt
from tests.synthetic import look_at_pose

RTT = measure_rtt()
print(f'RTT {RTT*1e3:.1f} ms', flush=True)

scenario = sys.argv[1] if len(sys.argv) > 1 else 'uniform'
variants = sys.argv[2:] or ['pallas', 'banded']

cfg = Config.fromfile(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'configs/paper_cfgs/ssdnerf_cars_uncond.py'))
tc = dict(cfg.train_cfg)
tc.pop('cache_load_from', None)
model = build_model(cfg.model, train_cfg=tc, test_cfg=dict(cfg.test_cfg))

key = jax.random.PRNGKey(0)
S, h, w = 8, 128, 128
code = 0.5 * jax.random.normal(key, (S,) + model.code_size)
params = model.decoder.init(
    key, code[:1], jnp.zeros((1, 8, 3)), jnp.zeros((1, 8, 3)))
H = model.grid_size

if scenario == 'uniform':
    occ = jax.random.uniform(key, (S, H ** 3)) < 0.10
    march_slots = None
else:
    # the driver's pruned scenario (bench.py roughened ellipsoid), so
    # A/B numbers here are directly comparable to BENCH_r*.json
    from bench import _blob_occupancy
    occ = jnp.asarray(_blob_occupancy(np, S, H))
    march_slots = 128
bitfield = packbits(occ.astype(jnp.float32), 0.5)
print(f'{scenario}: occupancy {float(occ.mean()):.3f}', flush=True)

pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
intr = jnp.asarray(np.broadcast_to(
    np.array([131.25, 131.25, 64., 64.], np.float32), (S, 1, 4)).copy())
rays_o, rays_d = get_cam_rays(poses, intr, h, w)
rays_o = rays_o.reshape(S, h * w, 3)
rays_d = rays_d.reshape(S, h * w, 3)

n_iters = 10


def run_variant(name):
    kw = {}
    P = 512 if march_slots is None else 256
    if name == 'xla':
        dec = model.decoder.clone(backend='xla', march_slots=march_slots)
    elif name == 'pallas':
        dec = model.decoder.clone(pack_slots=P, march_slots=march_slots)
    elif name == 'fused':
        dec = model.decoder.clone(pack_slots=P, fused_composite=True,
                                  march_slots=march_slots)
    else:
        dec = model.decoder.clone(pack_slots=P, banded_decode=True,
                                  march_slots=march_slots)

    @jax.jit
    def run(eps, code, ro, rd):
        def body(i, acc):
            out = volume_render(dec, params, code + eps * i, ro + eps * i,
                                rd, bitfield, H, dt_gamma=0.5 / 131.25,
                                T_thresh=1e-4, step_chunk=4, **kw)
            return acc + out['image'].sum()
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    z = jnp.float32(0.0)
    float(run(z, code, rays_o, rays_d))  # compile
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(z, code, rays_o, rays_d))
        best.append(time.perf_counter() - t0)
    dt = (sorted(best)[1] - RTT) / n_iters
    rps = S * h * w / dt
    print(f'{name:10s} {dt*1e3:7.2f} ms  {rps/1e6:6.2f} Mrays/s', flush=True)
    return dt


for v in variants:
    run_variant(v)
