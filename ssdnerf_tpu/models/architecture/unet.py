"""ADM-style denoising UNet (Flax, NHWC).

TPU-native rebuild of ``DenoisingUnetMod``
(/root/reference/lib/models/architecture/ddpm/denoising.py:13-216) and its
blocks (modules.py:13-129): scale-shift GroupNorm ResBlocks, multi-head
self-attention at configurable resolutions, grouped convolutions for the
per-plane (``groups=3``) tiled-triplane variant, sinusoidal time embedding.
Channel-last layout and bf16-friendly matmuls for the MXU; attention softmax
in float32.
"""
from typing import Any, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ssdnerf_tpu.ops.pallas.attention import (vmem_attention,
                                              vmem_attention_supported)


def timestep_embedding(t, dim, max_period=10000.0):
    """DDPM sinusoidal embedding: (B,) -> (B, dim).

    Matches mmgen ``TimeEmbedding.sinusodial_embedding`` (the reference's
    base class): frequency exponent ``arange(half)/half`` and ``[cos, sin]``
    concatenation order — required for reference-checkpoint import parity.
    """
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeEmbedding(nn.Module):
    base_channels: int
    embedding_channels: int

    @nn.compact
    def __call__(self, t):
        emb = timestep_embedding(t, self.base_channels)
        emb = nn.Dense(self.embedding_channels, name='dense_0')(emb)
        emb = jax.nn.silu(emb)
        emb = nn.Dense(self.embedding_channels, name='dense_1')(emb)
        return emb


def _gn(num_groups, name=None, dtype=None):
    # dtype=None (f32 modules): output promotes to f32 via the f32
    # scale/bias params — unchanged training numerics.  Under a bf16
    # module the caller passes bf16 so the normalized stream is written
    # once in bf16 instead of f32-then-cast (stats stay f32 inside
    # flax's _compute_stats); measured levers in PERF.md round 5.
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name=name,
                        dtype=dtype)


class ResBlock(nn.Module):
    """DenoisingResBlockMod (modules.py:52-110): GN-SiLU-conv, embedding
    injected as scale-shift (or additive) GN, GN-SiLU-(dropout)-conv,
    residual with 1x1 shortcut when channels change."""
    out_channels: int
    use_scale_shift_norm: bool = True
    dropout: float = 0.0
    groups: int = 1
    norm_groups: int = 32
    shortcut_kernel_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, deterministic=True):
        # GroupNorm statistics stay f32 (params are f32, flax promotes);
        # casting the GN *outputs* to the compute dtype is what makes the
        # bf16 mode actually halve HBM traffic — the UNet is bandwidth-
        # bound (PERF.md: fwd at ~120 TFLOP/s moving ~12 GB), and without
        # these casts every GN re-upcast the activation stream to f32.
        in_channels = x.shape[-1]
        h = _gn(self.norm_groups, 'norm_1', self.dtype)(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    feature_group_count=self.groups, name='conv_1')(h)

        emb_out = nn.Dense(
            self.out_channels * (2 if self.use_scale_shift_norm else 1),
            name='embedding_dense')(jax.nn.silu(emb))
        emb_out = emb_out[:, None, None, :]
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out.astype(self.dtype), 2, axis=-1)
            h = _gn(self.norm_groups, 'norm_2', self.dtype)(h) \
                * (1 + scale) + shift
        else:
            h = _gn(self.norm_groups, 'norm_2', self.dtype)(
                h + emb_out.astype(self.dtype))
        h = jax.nn.silu(h.astype(self.dtype))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        # ADM zero-module: the second conv starts at zero so the block is
        # the identity/shortcut at init (mmgen DenoisingResBlock
        # init_weights, following guided-diffusion's zero_module)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    feature_group_count=self.groups,
                    kernel_init=nn.initializers.zeros, name='conv_2')(h)

        if in_channels != self.out_channels:
            pad = 1 if self.shortcut_kernel_size == 3 else 0
            x = nn.Conv(self.out_channels,
                        (self.shortcut_kernel_size,) * 2, padding=pad,
                        dtype=self.dtype,
                        feature_group_count=self.groups, name='shortcut')(x)
        return (x + h).astype(self.dtype)


class SelfAttention(nn.Module):
    """MultiHeadAttentionMod (modules.py:13-48).  With groups > 1 the qkv /
    proj projections are per-group but attention runs over the concatenated
    tokens of all groups (group-aware attention for tiled triplanes).

    Attention computes in f32 EVEN under a bf16 module (``f32_core``,
    default on) WHEN the XLA core runs: the block is bandwidth-bound on
    the (B, nh, T, T) score matrix, and under bf16 the f32-softmax casts
    break XLA's matmul+softmax fusion — measured 0.27 ms f32 vs 1.00 ms
    bf16 for the identical 32^2 block (PERF.md round 5, job13); bf16
    operands buy nothing there because the score matmul accumulates f32
    regardless.  The Pallas VMEM core does its own f32 softmax with no
    XLA fusion to break, so under it the module keeps its bf16 dtype
    (halves qkv/proj/transpose traffic)."""
    num_heads: int = 4
    groups: int = 1
    norm_groups: int = 32
    dtype: Any = jnp.float32
    f32_core: bool = True
    # VMEM-resident Pallas attention core (ops/pallas/attention.py) when
    # the token count warrants it and we are on TPU; measured 5.1x over
    # the XLA core at the 32^2 level (0.115 vs 0.59 ms, PERF.md round 5).
    # True = auto (TPU only), False = XLA core, 'interpret' = run the
    # kernel in interpret mode on any backend (CPU tests of this path).
    attn_kernel: Any = True

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        T = H * W
        g, nh = self.groups, self.num_heads
        assert C % (g * nh) == 0, (C, g, nh)
        hd = C // (g * nh)  # per-head channel dim
        # 'axon' is the remote-TPU backend name (same gate as the
        # renderer's _resolve_backend)
        interpret = self.attn_kernel == 'interpret'
        use_kernel = (bool(self.attn_kernel)
                      and vmem_attention_supported(g * T, hd)
                      and (interpret
                           or jax.default_backend() in ('tpu', 'axon')))
        cdtype = (jnp.float32 if self.f32_core and not use_kernel
                  else self.dtype)
        h = _gn(self.norm_groups, 'norm', cdtype)(x).reshape(B, T, C)
        x_flat = x.reshape(B, T, C)
        qkv = nn.Conv(3 * C, (1,), feature_group_count=g, dtype=cdtype,
                      name='qkv')(h)
        # grouped conv output layout: g blocks of [q_i, k_i, v_i] (C/g each)
        qkv = qkv.reshape(B, T, g, 3, nh, hd)
        q, k, v = (qkv[:, :, :, i] for i in range(3))  # (B, T, g, nh, hd)
        # tokens concatenated across groups: (B, nh, g*T, hd)
        q = q.transpose(0, 3, 2, 1, 4).reshape(B, nh, g * T, hd)
        k = k.transpose(0, 3, 2, 1, 4).reshape(B, nh, g * T, hd)
        v = v.transpose(0, 3, 2, 1, 4).reshape(B, nh, g * T, hd)
        if use_kernel:
            a = vmem_attention(
                q.reshape(B * nh, g * T, hd), k.reshape(B * nh, g * T, hd),
                v.reshape(B * nh, g * T, hd), 1.0 / float(np.sqrt(hd)),
                interpret)
            a = a.reshape(B, nh, g * T, hd)
        else:
            scale = 1.0 / np.sqrt(np.sqrt(hd))
            weight = jnp.einsum('bhtc,bhsc->bhts', q * scale, k * scale,
                                preferred_element_type=jnp.float32)
            weight = jax.nn.softmax(weight.astype(jnp.float32),
                                    axis=-1).astype(cdtype)
            a = jnp.einsum('bhts,bhsc->bhtc', weight, v)
        a = a.reshape(B, nh, g, T, hd).transpose(0, 3, 2, 1, 4).reshape(B, T, C)
        # ADM zero-module: proj starts at zero, so with the pre-norm
        # residual below the attention block is the identity at init.
        # (Without the zero init, the pre-norm residual destabilizes
        # training: measured 10x worse DDPM loss on the sphere validation.)
        out = nn.Conv(C, (1,), feature_group_count=g, dtype=cdtype,
                      kernel_init=nn.initializers.zeros, name='proj')(a)
        # residual adds the PRE-norm input (modules.py:39-48: ``h + x``
        # where x was reshaped before self.norm was applied)
        return (out + x_flat).astype(x.dtype).reshape(B, H, W, C)


class Downsample(nn.Module):
    with_conv: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=1,
                           dtype=self.dtype,
                           feature_group_count=self.groups, name='conv')(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    with_conv: bool = True
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method='nearest')
        if self.with_conv:
            x = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype,
                        feature_group_count=self.groups, name='conv')(x)
        return x


class DenoisingUnet(nn.Module):
    """Config keys mirror the reference DenoisingUnetMod
    (configs/paper_cfgs/ssdnerf_cars_uncond.py:15-27)."""
    image_size: Tuple[int, int] = (128, 128)
    in_channels: int = 18
    concat_cond_channels: int = 0
    base_channels: int = 128
    resblocks_per_downsample: int = 2
    num_timesteps: int = 1000
    use_rescale_timesteps: bool = True
    dropout: float = 0.0
    embedding_channels: int = -1
    channels_cfg: Sequence[int] = (1, 2, 2, 4, 4)
    groups: int = 1
    norm_groups: int = 32
    shortcut_kernel_size: int = 1
    use_scale_shift_norm: bool = True
    num_heads: int = 4
    downsample_conv: bool = True
    upsample_conv: bool = True
    attention_res: Sequence[int] = (16, 8)
    # computation dtype ('float32' | 'bfloat16'); params and GroupNorm f32
    dtype: str = 'float32'
    # VMEM Pallas attention core where supported (see SelfAttention;
    # True / False / 'interpret')
    attn_kernel: Any = True

    @nn.compact
    def __call__(self, x_t, t, concat_cond=None, deterministic=True):
        """x_t: (B, H, W, C_in) NHWC. Returns (B, H, W, C_in)."""
        emb_ch = self.base_channels * 4 if self.embedding_channels == -1 \
            else self.embedding_channels
        if self.use_rescale_timesteps:
            t = t.astype(jnp.float32) * (1000.0 / self.num_timesteps)
        emb = TimeEmbedding(self.base_channels, emb_ch, name='time_embedding')(t)

        attention_scale = [min(self.image_size) // int(r)
                           for r in self.attention_res]

        h = x_t
        if self.concat_cond_channels > 0:
            h = jnp.concatenate([h, concat_cond], axis=-1)

        cdtype = jnp.dtype(self.dtype)

        def resblock(out_ch, name):
            return ResBlock(out_ch, self.use_scale_shift_norm, self.dropout,
                            self.groups, self.norm_groups,
                            self.shortcut_kernel_size, dtype=cdtype,
                            name=name)

        def attn(name):
            return SelfAttention(self.num_heads, self.groups,
                                 self.norm_groups, dtype=cdtype,
                                 attn_kernel=self.attn_kernel, name=name)

        # ---- encoder ----
        h = nn.Conv(self.base_channels, (3, 3), padding=1, dtype=cdtype,
                    feature_group_count=self.groups, name='in_conv')(h)
        hs = [h]
        scale = 1
        block_idx = 0
        ch = self.base_channels
        for level, factor in enumerate(self.channels_cfg):
            out_ch = self.base_channels * factor
            for _ in range(self.resblocks_per_downsample):
                h = resblock(out_ch, f'in_res_{block_idx}')(h, emb, deterministic)
                if scale in attention_scale:
                    h = attn(f'in_attn_{block_idx}')(h)
                hs.append(h)
                block_idx += 1
                ch = out_ch
            if level != len(self.channels_cfg) - 1:
                h = Downsample(self.downsample_conv, self.groups,
                               dtype=cdtype, name=f'down_{level}')(h)
                hs.append(h)
                scale *= 2

        # ---- middle ----
        h = resblock(ch, 'mid_res_0')(h, emb, deterministic)
        h = attn('mid_attn')(h)
        h = resblock(ch, 'mid_res_1')(h, emb, deterministic)

        # ---- decoder ----
        block_idx = 0
        for level, factor in enumerate(self.channels_cfg[::-1]):
            out_ch = self.base_channels * factor
            for idx in range(self.resblocks_per_downsample + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = resblock(out_ch, f'out_res_{block_idx}')(h, emb, deterministic)
                if scale in attention_scale:
                    h = attn(f'out_attn_{block_idx}')(h)
                if (level != len(self.channels_cfg) - 1
                        and idx == self.resblocks_per_downsample):
                    h = Upsample(self.upsample_conv, self.groups,
                                 dtype=cdtype, name=f'up_{level}')(h)
                    scale //= 2
                block_idx += 1

        # ---- out: GN -> SiLU -> conv (order matches ConvModule
        # ('norm','act','conv') at denoising.py:178-187) ----
        h = _gn(self.norm_groups, 'out_norm', cdtype)(h)
        h = jax.nn.silu(h)
        # ADM zero-module: the prediction head starts at zero
        out = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=cdtype,
                      feature_group_count=self.groups,
                      kernel_init=nn.initializers.zeros, name='out_conv')(h)
        return out.astype(jnp.float32)
