#!/usr/bin/env python
"""Stage-by-stage timing of the fused renderer on real hardware.

Every stage is timed with the in-jit fori_loop harness (PERF.md
"Measurement methodology"): N sequential iterations inside ONE jit with a
carry-serialized accumulator and an eps*i input perturbation, a single
8-byte readback, minus the measured ~30 ms axon RTT.  Per-call readback
timing (the v1 of this tool) inflates every stage by the RTT.

Usage: python tools/perf_breakdown.py [--bf16-march] [--march-slots N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ssdnerf_tpu.core.timing import measure_rtt
RTT = measure_rtt()  # per-run measured dispatch+readback cost
N_ITERS = 10


def timeit(make_body, *args, tag=''):
    """make_body(eps, *args) -> scalar; timed over N_ITERS in-jit iters."""

    @jax.jit
    def run(eps, *args):
        def body(i, acc):
            return acc + make_body(eps * i, *args)
        return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

    z = jnp.float32(0.0)
    _ = float(run(z, *args))
    dt = float('inf')
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(run(z, *args))
        dt = min(dt, (time.perf_counter() - t0 - RTT) / N_ITERS)
    print(f'{tag}: {dt * 1e3:.2f} ms')
    return dt


def _prefix_mode(dec, params, code, rays_o0, rays_d, tab, dt_gamma,
                 nears0, fars0, S, N, H, T, K, max_steps, dt_min, dt_max,
                 int8_dot, P=512, GR=16, clip_box=None):
    """Prefix-marginal timing of the PACKED render pipeline (PERF.md
    roofline).  Each prefix perturbs the rays so nothing upstream can be
    hoisted out of the timing loop; the marginal between consecutive
    prefixes is that stage's honest cost including the materialization
    of its outputs for the next stage."""
    from ssdnerf_tpu.models.decoders.renderer import _decode_fused
    from ssdnerf_tpu.ops import near_far_from_aabb, pallas as pallas_ops
    from ssdnerf_tpu.ops.marching import compact_samples, t_at_step
    from ssdnerf_tpu.ops.packing import pack_groups, composite_packed

    aabb = jnp.array([-dec.bound] * 3 + [dec.bound] * 3, jnp.float32)
    dec_p = dec.clone(pack_slots=P)
    G = N // GR
    gps = 1024 // P
    rpc = gps * GR

    def stage(eps, upto):
        ro = rays_o0 + eps
        nears, fars = near_far_from_aabb(ro, rays_d, aabb, dec.min_near)
        if clip_box is not None:   # march_slots occupied-AABB clipping
            nb, fb = jax.vmap(
                lambda o, d, b: near_far_from_aabb(o, d, b, dec.min_near)
            )(ro, rays_d, clip_box)
            nears = jnp.maximum(nears, nb)
            fars = jnp.minimum(fars, fb)
        t0 = nears
        pk = jnp.concatenate([ro, rays_d, t0[..., None], fars[..., None]],
                             axis=-1)
        valid = pallas_ops.march_valid_mask(
            pk, tab, dt_gamma, T=T, grid_size=H, bound=dec.bound,
            max_steps=max_steps, int8_dot=int8_dot)
        if upto == 0:
            return valid.sum()
        cs, cv = compact_samples(valid > 0.5, K)
        if upto == 1:
            return cs.sum() + cv.sum()
        pstep, pvalid, prid, soffs = pack_groups(cs, cv, P, GR)
        if upto == 2:
            return (pstep.sum() + pvalid.sum() + prid.sum() + soffs.sum())
        rid_b = prid[..., ::8]
        bsel = (rid_b[..., None] == jnp.arange(GR, dtype=jnp.int32)
                ).astype(jnp.float32)
        chans = jnp.concatenate([t0[..., None], ro, rays_d],
                                axis=-1).reshape(S, G, GR, 7)
        routed = jnp.einsum('sgdr,sgrc->sgdc', bsel, chans,
                            precision=jax.lax.Precision.HIGHEST)
        ps = lambda c: jnp.repeat(routed[..., c], 8, axis=-1)
        dtg4 = dt_gamma[:, None, None, None]
        pt = t_at_step(ps(0), pstep[..., None], dtg4,
                       dt_min, dt_max)[..., 0]
        pdt = jnp.clip(pt * dt_gamma[:, None, None], dt_min, dt_max)
        xyz = jnp.stack(
            [jnp.clip(ps(1 + c) + pt * ps(4 + c), -dec.bound, dec.bound)
             for c in range(3)], axis=-1)
        if upto == 3:
            return pt.sum() + pdt.sum() + xyz.sum()
        g_iota = jnp.arange(G, dtype=jnp.int32) % gps
        rid_local = prid + GR * g_iota[None, :, None]
        sigmas, rgb_ch = _decode_fused(dec_p, params, code + eps, xyz,
                                       rays_d, P, False, rid=rid_local,
                                       rpc=rpc)
        if upto == 4:
            return sigmas.sum() + sum(c.sum() for c in rgb_ch)
        ws, depth, image = composite_packed(sigmas, rgb_ch, pdt, pt,
                                            pvalid, prid, soffs, GR, 1e-4)
        return ws.sum() + depth.sum() + image.sum()

    def stage_fused(eps):
        # same pipeline but decode+composite in ONE kernel
        # (_decode_composite_fused); comparable to stage(upto=5)
        from ssdnerf_tpu.models.decoders.renderer import \
            _decode_composite_fused
        ro = rays_o0 + eps
        nears, fars = near_far_from_aabb(ro, rays_d, aabb, dec.min_near)
        if clip_box is not None:
            nb, fb = jax.vmap(
                lambda o, d, b: near_far_from_aabb(o, d, b, dec.min_near)
            )(ro, rays_d, clip_box)
            nears = jnp.maximum(nears, nb)
            fars = jnp.minimum(fars, fb)
        t0 = nears
        pk = jnp.concatenate([ro, rays_d, t0[..., None], fars[..., None]],
                             axis=-1)
        valid = pallas_ops.march_valid_mask(
            pk, tab, dt_gamma, T=T, grid_size=H, bound=dec.bound,
            max_steps=max_steps, int8_dot=int8_dot)
        cs, cv = compact_samples(valid > 0.5, K)
        pstep, pvalid, prid, soffs = pack_groups(cs, cv, P, GR)
        rid_b = prid[..., ::8]
        bsel = (rid_b[..., None] == jnp.arange(GR, dtype=jnp.int32)
                ).astype(jnp.float32)
        chans = jnp.concatenate([t0[..., None], ro, rays_d],
                                axis=-1).reshape(S, G, GR, 7)
        routed = jnp.einsum('sgdr,sgrc->sgdc', bsel, chans,
                            precision=jax.lax.Precision.HIGHEST)
        ps = lambda c: jnp.repeat(routed[..., c], 8, axis=-1)
        dtg4 = dt_gamma[:, None, None, None]
        pt = t_at_step(ps(0), pstep[..., None], dtg4, dt_min, dt_max)[..., 0]
        pdt = jnp.clip(pt * dt_gamma[:, None, None], dt_min, dt_max)
        xyz = jnp.stack(
            [jnp.clip(ps(1 + c) + pt * ps(4 + c), -dec.bound, dec.bound)
             for c in range(3)], axis=-1)
        g_iota = jnp.arange(G, dtype=jnp.int32) % gps
        rid_local = prid + GR * g_iota[None, :, None]
        D = P // 8
        db = jnp.arange(D, dtype=jnp.int32)
        r_iota = jnp.arange(GR, dtype=jnp.int32)
        onehot_r = (rid_b[..., None, :] == r_iota[:, None]).astype(
            jnp.float32)
        at_startB = ((soffs >> 3)[..., None] == db).astype(jnp.float32)
        pstartB = jnp.einsum('sgrd,sgrd->sgd', onehot_r, at_startB)
        slot0 = (jnp.arange(P, dtype=jnp.int32) % 8 == 0)
        pstart = jnp.repeat(pstartB, 8, axis=-1) \
            * slot0[None, None].astype(jnp.float32)
        ws, dep, rr, gg, bb = _decode_composite_fused(
            dec_p, params, code + eps, xyz, rays_d, pt, pdt,
            pvalid.astype(jnp.float32), pstart, P, 1e-4, False,
            rid=rid_local, rpc=rpc)
        return ws.sum() + dep.sum() + rr.sum() + gg.sum() + bb.sum()

    tags = ['P0 march', 'P1 +compact', 'P2 +pack',
            'P3 +prep(route/t/xyz)', 'P4 +decode', 'P5 +composite (full)']
    ts_ = [timeit(lambda eps, u=u: stage(eps, u).astype(jnp.float32),
                  tag=tags[u]) for u in range(6)]
    timeit(lambda eps: stage_fused(eps).astype(jnp.float32),
           tag='P5f fused decode+composite (full)')
    print('marginals:',
          '  '.join(f'{t}: {(b - a) * 1e3:+.2f} ms'
                    for t, a, b in zip(tags[1:], ts_, ts_[1:])))
    print(f'=> full packed pipeline {ts_[-1] * 1e3:.2f} ms = '
          f'{S * N / ts_[-1] / 1e6:.2f} Mrays/s')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--bf16-march', action='store_true')
    ap.add_argument('--march-slots', type=int, default=None)
    ap.add_argument('--blob', action='store_true',
                    help='pruned bench scenario: coherent blob occupancy '
                         '+ occupied-AABB ray clipping (combine with '
                         '--march-slots 128 --pack 256)')
    ap.add_argument('--pack', type=int, default=512)
    ap.add_argument('--prefix', action='store_true',
                    help='honest prefix-marginal timing: run progressively '
                         'longer pipeline prefixes (march; +compact; +pack; '
                         '+prep; +decode; +composite), all un-hoisted, and '
                         'report the marginal cost of each stage.  Isolated '
                         'stage timings (the default mode) let XLA fuse '
                         'consumers into producers and can understate '
                         'cross-stage materialization (PERF.md roofline).')
    args_cli = ap.parse_args()

    jax.config.update('jax_compilation_cache_dir',
                      os.path.expanduser('~/.cache/jax_comp_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    from ssdnerf_tpu.models import TriPlaneDecoder
    from ssdnerf_tpu.models.decoders.renderer import _decode_fused, \
        volume_render
    from ssdnerf_tpu.ops import get_cam_rays, near_far_from_aabb, \
        composite_rays
    from ssdnerf_tpu.ops.morton import packbits
    from ssdnerf_tpu.ops.marching import SQRT3, compact_samples, t_at_step
    from ssdnerf_tpu.ops import pallas as pallas_ops
    from tests.synthetic import look_at_pose

    key = jax.random.PRNGKey(0)
    S, h, w, H = 8, 128, 128, 64
    K = 64
    T = args_cli.march_slots or 256
    max_steps = 256
    N = h * w
    code = 0.5 * jax.random.normal(key, (S, 3, 6, 128, 128))
    dec = TriPlaneDecoder(backend='auto', compact_steps=K)
    params = dec.init(key, code[:1], jnp.zeros((1, 8, 3)),
                      jnp.zeros((1, 8, 3)))
    if args_cli.blob:
        # the DRIVER's pruned scenario (bench.py roughened ellipsoid) —
        # the tool previously used a r=0.55 sphere (8.7% fill, tighter
        # AABB), which made its marginals ~8% faster than the bench it
        # was meant to decompose (VERDICT r4 weak #2)
        from bench import _blob_occupancy
        occ = jnp.asarray(_blob_occupancy(np, S, H))
    else:
        occ = jax.random.uniform(key, (S, H ** 3)) < 0.10
    bitfield = packbits(occ.astype(jnp.float32), 0.5)

    pose = look_at_pose(np.array([1.8, 0.6, 1.8]))
    poses = jnp.asarray(np.broadcast_to(pose, (S, 1, 4, 4)).copy())
    intr = jnp.asarray(np.broadcast_to(
        np.array([131.25, 131.25, 64., 64.], np.float32), (S, 1, 4)).copy())
    rays_o, rays_d = get_cam_rays(poses, intr, h, w)
    rays_o = rays_o.reshape(S, N, 3)
    rays_d = rays_d.reshape(S, N, 3)
    dt_gamma = jnp.full((S,), 0.5 / 131.25)
    dt_min = 2.0 * SQRT3 / max_steps
    dt_max = 2.0 * SQRT3 / H

    tab = jax.jit(lambda b: pallas_ops.occupancy_table(b, H))(bitfield)
    aabb = jnp.array([-1.0] * 3 + [1.0] * 3, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, 0.2)
    if args_cli.blob and args_cli.march_slots:
        from ssdnerf_tpu.ops.marching import occupied_aabb
        box = jax.jit(lambda b: occupied_aabb(b, H, 1.0))(bitfield)
        nb, fb = jax.vmap(
            lambda o, d, b: near_far_from_aabb(o, d, b, 0.2)
        )(rays_o, rays_d, box)
        nears = jnp.maximum(nears, nb)
        fars = jnp.minimum(fars, fb)
    t0v = nears
    int8_dot = not args_cli.bf16_march
    print(f'march dtype: {"int8" if int8_dot else "bf16"}, T={T}, K={K}')

    if args_cli.prefix:
        clip_box = None
        if args_cli.blob and args_cli.march_slots:
            from ssdnerf_tpu.ops.marching import occupied_aabb
            clip_box = jax.jit(lambda b: occupied_aabb(b, H, 1.0))(bitfield)
        _prefix_mode(dec, params, code, rays_o, rays_d, tab, dt_gamma,
                     nears, fars, S, N, H, T, K, max_steps, dt_min, dt_max,
                     int8_dot, P=args_cli.pack, clip_box=clip_box)
        return

    def march_fn(eps, rays_o, rays_d, t0v, fars, tab, dt_gamma):
        pack = jnp.concatenate(
            [rays_o, rays_d, (t0v + eps)[..., None], fars[..., None]],
            axis=-1)
        return pallas_ops.march_valid_mask(
            pack, tab, dt_gamma, T=T, grid_size=H, bound=1.0,
            max_steps=max_steps, int8_dot=int8_dot).sum()

    timeit(march_fn, rays_o, rays_d, t0v, fars, tab, dt_gamma,
           tag='march kernel (incl. XLA prep)')

    pack = jnp.concatenate(
        [rays_o, rays_d, t0v[..., None], fars[..., None]], axis=-1)
    valid = jax.jit(lambda p: pallas_ops.march_valid_mask(
        p, tab, dt_gamma, T=T, grid_size=H, bound=1.0,
        max_steps=max_steps, int8_dot=int8_dot))(pack)

    def compact_fn(eps, valid, t0v, dt_gamma):
        v = (valid + eps) > 0.5
        comp_step, comp_valid = compact_samples(v, K)
        dtg = dt_gamma[:, None, None]
        comp_ts = t_at_step(t0v, comp_step, dtg, dt_min, dt_max)
        comp_dts = jnp.clip(comp_ts * dtg, dt_min, dt_max)
        return comp_ts.sum() + comp_dts.sum() + comp_valid.sum()

    timeit(compact_fn, valid, t0v, dt_gamma, tag='compact+t')

    comp_step, comp_valid = jax.jit(
        lambda v: compact_samples(v > 0.5, K))(valid)
    comp_ts = t_at_step(t0v, comp_step, dt_gamma[:, None, None],
                        dt_min, dt_max)
    comp_dts = jnp.clip(comp_ts * dt_gamma[:, None, None], dt_min, dt_max)

    def decode_fn(eps, code, comp_ts, rays_o, rays_d):
        xyz = jnp.clip(
            rays_o[:, :, None, :]
            + comp_ts[..., None] * rays_d[:, :, None, :], -1.0, 1.0)
        sig, rgb = _decode_fused(dec, params, code + eps, xyz, rays_d, K,
                                 False)
        return sig.sum() + rgb[0].sum()

    timeit(decode_fn, code, comp_ts, rays_o, rays_d,
           tag='decode kernel (+xyz prep +activations)')

    sig, rgb = jax.jit(lambda c, t: _decode_fused(
        dec, params, c,
        jnp.clip(rays_o[:, :, None, :] + t[..., None] * rays_d[:, :, None, :],
                 -1, 1), rays_d, K, False))(code, comp_ts)
    rgb_s = jnp.stack(rgb, axis=-1)

    def comp_fn(eps, sig, rgb_s, comp_dts, comp_ts, comp_valid):
        return composite_rays(sig + eps, rgb_s, comp_dts, comp_ts,
                              comp_valid, 1e-4)[2].sum()

    timeit(comp_fn, sig, rgb_s, comp_dts, comp_ts, comp_valid,
           tag='composite')

    # ------------------------------------------------------------------ #
    # packed-path stages (pack_slots=512, the shipped setting)
    # ------------------------------------------------------------------ #
    from ssdnerf_tpu.ops.packing import pack_groups, composite_packed

    P, GR = 512, 16

    def pack_fn(eps, comp_step, comp_valid):
        pstep, pvalid, prid, soffs = pack_groups(
            comp_step + eps, comp_valid, P, GR)
        return pstep.sum() + pvalid.sum() + prid.sum() + soffs.sum()

    timeit(pack_fn, comp_step, comp_valid, tag='pack_groups')

    pstep, pvalid, prid, soffs = jax.jit(
        lambda cs, cv: pack_groups(cs, cv, P, GR))(comp_step, comp_valid)
    G = N // GR
    gps = 1024 // P
    rpc = gps * GR

    def prep_fn(eps, pstep, prid, t0v, rays_o, rays_d, dt_gamma):
        rid_b = prid[..., ::8]
        bsel = (rid_b[..., None] == jnp.arange(GR, dtype=jnp.int32)
                ).astype(jnp.float32)
        chans = jnp.concatenate(
            [t0v[..., None] + eps, rays_o, rays_d],
            axis=-1).reshape(S, G, GR, 7)
        routed = jnp.einsum('sgdr,sgrc->sgdc', bsel, chans)
        ps = lambda c: jnp.repeat(routed[..., c], 8, axis=-1)
        dtg4 = dt_gamma[:, None, None, None]
        pt = t_at_step(ps(0), pstep[..., None], dtg4, dt_min, dt_max)[..., 0]
        pdt = jnp.clip(pt * dt_gamma[:, None, None], dt_min, dt_max)
        xyz = jnp.stack(
            [jnp.clip(ps(1 + c) + pt * ps(4 + c), -1.0, 1.0)
             for c in range(3)], axis=-1)
        return pt.sum() + pdt.sum() + xyz.sum()

    timeit(prep_fn, pstep, prid, t0v, rays_o, rays_d, dt_gamma,
           tag='packed prep (route+t+xyz)')

    dec_p = dec.clone(pack_slots=P)

    def full_packed_fn(eps, code, rays_o, rays_d, bitfield):
        # rays perturbed too: otherwise XLA hoists the march prefix out
        # of the timing loop (bench.py, PERF.md round-3 notes)
        out = volume_render(dec_p, params, code + eps, rays_o + eps, rays_d,
                            bitfield, H, dt_gamma=0.5 / 131.25,
                            T_thresh=1e-4, step_chunk=4)
        return out['image'].sum()

    dtp = timeit(full_packed_fn, code, rays_o, rays_d, bitfield,
                 tag='full fused render (packed P=512)')
    print(f'=> packed: {S * N / dtp / 1e6:.2f} Mrays/s')

    dec_r = dec.clone(march_slots=args_cli.march_slots) \
        if args_cli.march_slots else dec

    def full_fn(eps, code, rays_o, rays_d, bitfield):
        out = volume_render(dec_r, params, code + eps, rays_o + eps, rays_d,
                            bitfield, H, dt_gamma=0.5 / 131.25,
                            T_thresh=1e-4, step_chunk=4)
        return out['image'].sum()

    dt = timeit(full_fn, code, rays_o, rays_d, bitfield,
                tag='full fused render (per-ray)')
    print(f'=> {S * N / dt / 1e6:.2f} Mrays/s')
    print(f'valid fraction: {float(jnp.mean(valid)):.3f}')


if __name__ == '__main__':
    main()
