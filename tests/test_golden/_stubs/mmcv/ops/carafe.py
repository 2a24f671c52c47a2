"""CARAFE content-aware upsampling, pure torch (unfold + weighted sum)."""
import torch
import torch.nn as nn
import torch.nn.functional as F


class CARAFEPack(nn.Module):
    def __init__(self, channels, scale_factor, up_kernel=5, up_group=1,
                 encoder_kernel=3, encoder_dilation=1,
                 compressed_channels=64):
        super().__init__()
        self.channels = channels
        self.scale_factor = scale_factor
        self.up_kernel = up_kernel
        self.up_group = up_group
        self.channel_compressor = nn.Conv2d(channels, compressed_channels, 1)
        self.content_encoder = nn.Conv2d(
            compressed_channels,
            up_kernel * up_kernel * up_group * scale_factor * scale_factor,
            encoder_kernel,
            padding=int((encoder_kernel - 1) * encoder_dilation / 2),
            dilation=encoder_dilation)

    def init_weights(self):
        pass

    def forward(self, x):
        b, c, h, w = x.shape
        s, k = self.scale_factor, self.up_kernel
        masks = self.content_encoder(self.channel_compressor(x))
        masks = F.pixel_shuffle(masks, s)  # (B, k*k*g, H*s, W*s)
        masks = masks.view(b, self.up_group, k * k, h * s, w * s)
        masks = F.softmax(masks, dim=2)
        # neighbourhood of each upsampled pixel in the LOW-res map
        xu = F.unfold(x, k, padding=k // 2)  # (B, C*k*k, H*W)
        xu = xu.view(b, c, k * k, h, w)
        xu = xu.repeat_interleave(s, dim=3).repeat_interleave(s, dim=4)
        cpg = c // self.up_group
        xu = xu.view(b, self.up_group, cpg, k * k, h * s, w * s)
        out = (xu * masks[:, :, None]).sum(dim=3)
        return out.reshape(b, c, h * s, w * s)
