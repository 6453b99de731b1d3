"""Torch fixture replicating the reference UNet's module tree + forward.

The reference ``DenoisingUnetMod`` builds its module tree partly in-repo
(/root/reference/lib/models/architecture/ddpm/denoising.py:44-190,
modules.py:13-129) and partly from mmgen 0.7.2 base classes (TimeEmbedding,
NormWithEmbedding, EmbedSequential, QKVAttention, the up/down-sample
forwards).  mmgen is not installable here, so this fixture transcribes that
exact structure — state_dict key names, tensor shapes AND forward math — so
that checkpoint conversion can be verified against the real naming scheme
and real numerics, not against the converter's own assumptions
(tests/test_convert.py round-trips alone can't catch a wrong name guess).

Only a test fixture; nothing imports this outside tests.
"""
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def sinusoidal_embedding(timesteps, dim, max_period=10000):
    """mmgen TimeEmbedding.sinusodial_embedding: cos first, /half freqs."""
    half = dim // 2
    freqs = torch.exp(
        -np.log(max_period)
        * torch.arange(half, dtype=torch.float32) / half)
    args = timesteps[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimeEmbedding(nn.Module):
    def __init__(self, in_channels, embedding_channels):
        super().__init__()
        self.blocks = nn.Sequential(
            nn.Linear(in_channels, embedding_channels), nn.SiLU(),
            nn.Linear(embedding_channels, embedding_channels))
        self.in_channels = in_channels

    def forward(self, t):
        return self.blocks(sinusoidal_embedding(t, self.in_channels))


class NormWithEmbedding(nn.Module):
    def __init__(self, in_channels, embedding_channels, use_scale_shift=True):
        super().__init__()
        self.use_scale_shift = use_scale_shift
        self.norm = nn.GroupNorm(32, in_channels)
        out = in_channels * 2 if use_scale_shift else in_channels
        self.embedding_layer = nn.Sequential(
            nn.SiLU(), nn.Linear(embedding_channels, out))

    def forward(self, x, y):
        embedding = self.embedding_layer(y)[:, :, None, None]
        if self.use_scale_shift:
            scale, shift = torch.chunk(embedding, 2, dim=1)
            return self.norm(x) * (1 + scale) + shift
        return self.norm(x + embedding)


class DenoisingResBlock(nn.Module):
    """modules.py:52-110 (DenoisingResBlockMod)."""

    def __init__(self, in_channels, embedding_channels, use_scale_shift_norm,
                 dropout, groups=1, out_channels=None,
                 shortcut_kernel_size=1):
        super().__init__()
        out_channels = in_channels if out_channels is None else out_channels
        self.conv_1 = nn.Sequential(
            nn.GroupNorm(32, in_channels), nn.SiLU(),
            nn.Conv2d(in_channels, out_channels, 3, padding=1, groups=groups))
        self.norm_with_embedding = NormWithEmbedding(
            out_channels, embedding_channels, use_scale_shift_norm)
        conv_2 = [nn.SiLU(), nn.Dropout(dropout),
                  nn.Conv2d(out_channels, out_channels, 3, padding=1,
                            groups=groups)] if dropout > 0 else \
            [nn.SiLU(), nn.Conv2d(out_channels, out_channels, 3, padding=1,
                                  groups=groups)]
        self.conv_2 = nn.Sequential(*conv_2)
        self.learnable_shortcut = out_channels != in_channels
        if self.learnable_shortcut:
            pad = 1 if shortcut_kernel_size == 3 else 0
            self.shortcut = nn.Conv2d(in_channels, out_channels,
                                      shortcut_kernel_size, padding=pad,
                                      groups=groups)

    def forward(self, x, y):
        shortcut = self.shortcut(x) if self.learnable_shortcut else x
        x = self.conv_1(x)
        x = self.norm_with_embedding(x, y)
        x = self.conv_2(x)
        return x + shortcut


class MultiHeadAttention(nn.Module):
    """modules.py:13-48 (MultiHeadAttentionMod) incl. the mmgen
    QKVAttention head split."""

    def __init__(self, in_channels, num_heads=1, groups=1):
        super().__init__()
        self.num_heads = num_heads
        self.groups = groups
        self.norm = nn.GroupNorm(32, in_channels)
        self.qkv = nn.Conv1d(in_channels, in_channels * 3, 1, groups=groups)
        self.proj = nn.Conv1d(in_channels, in_channels, 1, groups=groups)

    @staticmethod
    def QKVAttention(qkv):
        channel = qkv.shape[1] // 3
        q, k, v = torch.chunk(qkv, 3, dim=1)
        scale = 1 / np.sqrt(np.sqrt(channel))
        weight = torch.einsum('bct,bcs->bts', q * scale, k * scale)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        return torch.einsum('bts,bcs->bct', weight, v)

    def forward(self, x):
        b, c, *spatial = x.shape
        x = x.reshape(b, c, -1)
        spatial_numel = x.size(-1)
        qkv = self.qkv(self.norm(x))
        qkv = qkv.reshape(
            b, self.groups, -1, spatial_numel
        ).transpose(1, 2).reshape(b * self.num_heads, -1,
                                  self.groups * spatial_numel)
        h = self.QKVAttention(qkv)
        h = h.reshape(
            b, -1, self.groups, spatial_numel
        ).transpose(1, 2).reshape(b, -1, spatial_numel)
        h = self.proj(h)
        return (h + x).reshape(b, c, *spatial)


class DenoisingDownsample(nn.Module):
    def __init__(self, in_channels, groups=1, with_conv=True):
        super().__init__()
        if with_conv:
            self.downsample = nn.Conv2d(in_channels, in_channels, 3, 2, 1,
                                        groups=groups)
        else:
            self.downsample = nn.AvgPool2d(stride=2)

    def forward(self, x):
        return self.downsample(x)


class DenoisingUpsample(nn.Module):
    def __init__(self, in_channels, groups=1, with_conv=True):
        super().__init__()
        self.with_conv = with_conv
        if with_conv:
            self.conv = nn.Conv2d(in_channels, in_channels, 3, 1, 1,
                                  groups=groups)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode='nearest')
        if self.with_conv:
            x = self.conv(x)
        return x


class EmbedSequential(nn.Sequential):
    def forward(self, x, y):
        for layer in self:
            if isinstance(layer, DenoisingResBlock):
                x = layer(x, y)
            else:
                x = layer(x)
        return x


class OutConvModule(nn.Module):
    """mmcv ConvModule(order=('norm','act','conv')) with GN: child names
    'gn' and 'conv'."""

    def __init__(self, in_channels, out_channels, groups=1):
        super().__init__()
        self.gn = nn.GroupNorm(32, in_channels)
        self.act = nn.SiLU()
        self.conv = nn.Conv2d(in_channels, out_channels, 3, padding=1,
                              groups=groups)

    def forward(self, x):
        return self.conv(self.act(self.gn(x)))


class DenoisingUnetMod(nn.Module):
    """Transcription of denoising.py:44-216 construction + forward."""

    def __init__(self, image_size, in_channels=3, concat_cond_channels=0,
                 base_channels=128, resblocks_per_downsample=3,
                 num_timesteps=1000, use_rescale_timesteps=True, dropout=0,
                 embedding_channels=-1, channels_cfg=None, groups=1,
                 shortcut_kernel_size=1, use_scale_shift_norm=False,
                 num_heads=4, downsample_conv=True, upsample_conv=True,
                 attention_res=(16, 8)):
        super().__init__()
        self.num_timesteps = num_timesteps
        self.use_rescale_timesteps = use_rescale_timesteps
        self.concat_cond_channels = concat_cond_channels
        if isinstance(image_size, int):
            image_size = [image_size, image_size]
        out_channels = in_channels
        channel_factor_list = list(channels_cfg)
        embedding_channels = base_channels * 4 \
            if embedding_channels == -1 else embedding_channels
        self.time_embedding = TimeEmbedding(base_channels, embedding_channels)

        def resblock(in_ch, out_ch=None):
            return DenoisingResBlock(in_ch, embedding_channels,
                                     use_scale_shift_norm, dropout, groups,
                                     out_ch, shortcut_kernel_size)

        attention_scale = [min(image_size) // int(r) for r in attention_res]
        scale = 1
        self.in_blocks = nn.ModuleList([
            EmbedSequential(nn.Conv2d(in_channels + concat_cond_channels,
                                      base_channels, 3, 1, padding=1,
                                      groups=groups))])
        self.in_channels_list = [base_channels]
        for level, factor in enumerate(channel_factor_list):
            in_channels_ = base_channels if level == 0 \
                else base_channels * channel_factor_list[level - 1]
            out_channels_ = base_channels * factor
            for _ in range(resblocks_per_downsample):
                layers = [resblock(in_channels_, out_channels_)]
                in_channels_ = out_channels_
                if scale in attention_scale:
                    layers.append(MultiHeadAttention(in_channels_, num_heads,
                                                     groups))
                self.in_channels_list.append(in_channels_)
                self.in_blocks.append(EmbedSequential(*layers))
            if level != len(channel_factor_list) - 1:
                self.in_blocks.append(EmbedSequential(
                    DenoisingDownsample(in_channels_, groups,
                                        downsample_conv)))
                self.in_channels_list.append(in_channels_)
                scale *= 2

        self.mid_blocks = EmbedSequential(
            resblock(in_channels_),
            MultiHeadAttention(in_channels_, num_heads, groups),
            resblock(in_channels_))

        in_channels_list = list(self.in_channels_list)
        self.out_blocks = nn.ModuleList()
        for level, factor in enumerate(channel_factor_list[::-1]):
            for idx in range(resblocks_per_downsample + 1):
                layers = [resblock(in_channels_ + in_channels_list.pop(),
                                   base_channels * factor)]
                in_channels_ = base_channels * factor
                if scale in attention_scale:
                    layers.append(MultiHeadAttention(in_channels_, num_heads,
                                                     groups))
                if (level != len(channel_factor_list) - 1
                        and idx == resblocks_per_downsample):
                    layers.append(DenoisingUpsample(in_channels_, groups,
                                                    upsample_conv))
                    scale //= 2
                self.out_blocks.append(EmbedSequential(*layers))

        self.out = OutConvModule(in_channels_, out_channels, groups)

    def forward(self, x_t, t, concat_cond=None):
        if self.use_rescale_timesteps:
            t = t.float() * (1000.0 / self.num_timesteps)
        embedding = self.time_embedding(t)
        h, hs = x_t, []
        if self.concat_cond_channels > 0:
            h = torch.cat([h, concat_cond], dim=1)
        for block in self.in_blocks:
            h = block(h, embedding)
            hs.append(h)
        h = self.mid_blocks(h, embedding)
        for block in self.out_blocks:
            h = block(torch.cat([h, hs.pop()], dim=1), embedding)
        return self.out(h)
