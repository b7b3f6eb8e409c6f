"""Independent PyTorch implementation of the ResDepth UNet topology.

Written from the architecture specification (SURVEY.md §3.3) as a test oracle
for the JAX model: same state_dict key layout as the reference implementation
so it also exercises the torch-checkpoint importer exactly as a real
reference checkpoint would.
"""

import torch
import torch.nn as nn


def _act(name):
    return {"relu": nn.ReLU(), "lrelu": nn.LeakyReLU(), "prelu": nn.PReLU()}[name]


def _conv_bn_act(cin, cout, act, bn):
    layers = [nn.Conv2d(cin, cout, 3, padding=1, bias=not bn)]
    if bn:
        layers.append(nn.BatchNorm2d(cout))
    layers.append(_act(act))
    return nn.Sequential(*layers)


def _up(cin, cout, mode):
    if mode == "transpose":
        return nn.ConvTranspose2d(cin, cout, 2, stride=2)
    return nn.Sequential(nn.Upsample(scale_factor=2, mode="bilinear"),
                         nn.Conv2d(cin, cout, 1))


class TorchUNet(nn.Module):
    def __init__(self, n_input_channels=1, start_kernel=64, max_filter_depth=512,
                 depth=5, act_fn_encoder="relu", act_fn_decoder="relu",
                 act_fn_bottleneck="relu", up_mode="transpose", do_BN=True,
                 bias_conv_layer=False, outer_skip=True, outer_skip_BN=False):
        super().__init__()
        widths = [min(start_kernel * 2 ** i, max_filter_depth) for i in range(depth)]
        self.depth = depth
        self.outer_skip = outer_skip
        self.outer_skip_BN = outer_skip_BN

        self.encoder = nn.ModuleList()
        cin = n_input_channels
        for w in widths:
            self.encoder.append(nn.Sequential(
                _conv_bn_act(cin, w, act_fn_encoder, do_BN), nn.MaxPool2d(2, 2)))
            cin = w

        self.bottleneck = _conv_bn_act(widths[-1], widths[-1], act_fn_bottleneck, do_BN)

        rev = widths[::-1]
        self.decoder = nn.ModuleList()
        for i in range(depth - 1):
            self.decoder.append(nn.Sequential(
                _up(rev[i], rev[i], up_mode),
                _conv_bn_act(rev[i], rev[i + 1], act_fn_decoder, do_BN)))
        self.decoder.append(_up(rev[-1], rev[-1], up_mode))

        self.last_layer = nn.Conv2d(start_kernel, 1, 3, padding=1, bias=bias_conv_layer)

        if outer_skip and outer_skip_BN:
            self.layer_outer_skip = nn.ModuleList([nn.BatchNorm2d(1)])

    def forward(self, x):
        skips = []
        out = x
        for level in self.encoder:
            pre_pool = level[0](out)
            skips.append(pre_pool)
            out = level[1](pre_pool)

        out = self.bottleneck(out)

        for i, level in enumerate(self.decoder):
            if i < self.depth - 1:
                up = level[0](out)
                out = skips[-1 - i] + up
                out = level[1](out)
            else:
                up = level(out)
                out = skips[0] + up

        out = self.last_layer(out)

        if self.outer_skip:
            x0 = x[:, 0:1]
            if self.outer_skip_BN:
                x0 = self.layer_outer_skip[0](x0)
            out = out + x0
        return out
