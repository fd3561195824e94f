"""Value-level validation of the torch WaveRNN importer.

A torch twin of the reference fatchord WaveRNN is built here from
torch.nn primitives following the reference architecture spec
(fatchord_version.py:13-167: module names, kernel sizes, bias flags, GRU
residual dataflow — reconstructed, not copied), randomly initialized
(including BN running stats), exported via ``state_dict()``, imported with
tools/import_torch_wavernn.import_state_dict, and the teacher-forced
forward of OUR model must match torch's eval-mode forward.  Any wrong
transpose, gate order, BN stat mapping, eps, or up-layer index fails this.
"""

from __future__ import annotations

import numpy as np
import pytest
from conftest import make_tiny_cfg

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tools.import_torch_wavernn import import_state_dict  # noqa: E402


class TorchResBlock(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.conv1 = nn.Conv1d(dims, dims, kernel_size=1, bias=False)
        self.conv2 = nn.Conv1d(dims, dims, kernel_size=1, bias=False)
        self.batch_norm1 = nn.BatchNorm1d(dims)
        self.batch_norm2 = nn.BatchNorm1d(dims)

    def forward(self, x):
        r = x
        x = F.relu(self.batch_norm1(self.conv1(x)))
        return self.batch_norm2(self.conv2(x)) + r


class TorchMelResNet(nn.Module):
    def __init__(self, res_blocks, in_dims, compute_dims, res_out_dims, pad):
        super().__init__()
        self.conv_in = nn.Conv1d(in_dims, compute_dims, kernel_size=2 * pad + 1, bias=False)
        self.batch_norm = nn.BatchNorm1d(compute_dims)
        self.layers = nn.ModuleList(TorchResBlock(compute_dims) for _ in range(res_blocks))
        self.conv_out = nn.Conv1d(compute_dims, res_out_dims, kernel_size=1)

    def forward(self, x):
        x = F.relu(self.batch_norm(self.conv_in(x)))
        for f in self.layers:
            x = f(x)
        return self.conv_out(x)


class TorchStretch2d(nn.Module):
    def __init__(self, x_scale):
        super().__init__()
        self.x_scale = x_scale

    def forward(self, x):
        return torch.repeat_interleave(x, self.x_scale, dim=-1)


class TorchUpsample(nn.Module):
    def __init__(self, feat_dims, scales, compute_dims, res_blocks, res_out_dims, pad):
        super().__init__()
        total = int(np.prod(scales))
        self.indent = pad * total
        self.resnet = TorchMelResNet(res_blocks, feat_dims, compute_dims, res_out_dims, pad)
        self.resnet_stretch = TorchStretch2d(total)
        self.up_layers = nn.ModuleList()
        for s in scales:
            conv = nn.Conv2d(1, 1, kernel_size=(1, 2 * s + 1), padding=(0, s), bias=False)
            # the reference mean-initializes; we randomize to make the test
            # sensitive to the up-layer index mapping
            self.up_layers.append(TorchStretch2d(s))
            self.up_layers.append(conv)

    def forward(self, m):
        aux = self.resnet(m).unsqueeze(1)
        aux = self.resnet_stretch(aux).squeeze(1)
        m = m.unsqueeze(1)
        for f in self.up_layers:
            m = f(m)
        m = m.squeeze(1)[:, :, self.indent : -self.indent]
        return m.transpose(1, 2), aux.transpose(1, 2)


class TorchWaveRNN(nn.Module):
    def __init__(self, rnn_dims, fc_dims, bits, pad, scales, feat_dims,
                 compute_dims, res_out_dims, res_blocks):
        super().__init__()
        self.aux_dims = res_out_dims // 4
        self.n_classes = 2 ** bits
        self.upsample = TorchUpsample(feat_dims, scales, compute_dims, res_blocks,
                                      res_out_dims, pad)
        self.I = nn.Linear(feat_dims + self.aux_dims + 1, rnn_dims)
        self.rnn1 = nn.GRU(rnn_dims, rnn_dims, batch_first=True)
        self.rnn2 = nn.GRU(rnn_dims + self.aux_dims, rnn_dims, batch_first=True)
        self.fc1 = nn.Linear(rnn_dims + self.aux_dims, fc_dims)
        self.fc2 = nn.Linear(fc_dims + self.aux_dims, fc_dims)
        self.fc3 = nn.Linear(fc_dims, self.n_classes)
        self.register_buffer("step", torch.zeros(1, dtype=torch.long))

    def forward(self, x, mels):
        mels, aux = self.upsample(mels)
        d = self.aux_dims
        a1, a2, a3, a4 = (aux[:, :, i * d : (i + 1) * d] for i in range(4))
        x = torch.cat([x.unsqueeze(-1), mels, a1], dim=2)
        x = self.I(x)
        res = x
        x, _ = self.rnn1(x)
        x = x + res
        res = x
        x, _ = self.rnn2(torch.cat([x, a2], dim=2))
        x = x + res
        x = F.relu(self.fc1(torch.cat([x, a3], dim=2)))
        x = F.relu(self.fc2(torch.cat([x, a4], dim=2)))
        return self.fc3(x)


def test_torch_import_forward_parity():
    import jax

    from tacotronv2_wavernn_chinese_tpu.models import wavernn as W

    cfg = make_tiny_cfg()
    wc = cfg.wavernn
    bits = cfg.audio.bits  # 8
    torch.manual_seed(0)
    model = TorchWaveRNN(
        wc.rnn_dims, wc.fc_dims, bits, wc.pad, wc.upsample_factors,
        cfg.audio.num_mels, wc.compute_dims, wc.res_out_dims, wc.res_blocks,
    )
    # randomize BN running stats so the stat mapping is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
        model.step.fill_(123456)
    model.eval()

    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params, step, unused = import_state_dict(cfg, state)
    assert step == 123456
    assert unused == []

    rng = np.random.default_rng(0)
    B, T_mel = 2, 9 + 2 * wc.pad
    hop = int(np.prod(wc.upsample_factors))
    T = 9 * hop
    x = (rng.uniform(-1, 1, (B, T))).astype(np.float32)
    mels = rng.uniform(0, 1, (B, T_mel, cfg.audio.num_mels)).astype(np.float32)

    with torch.no_grad():
        want = model(
            torch.from_numpy(x), torch.from_numpy(mels).transpose(1, 2)
        ).numpy()

    got, _ = W.forward(
        jax.tree_util.tree_map(np.asarray, params), wc, x, mels, train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-4)


def test_torch_import_rejects_wrong_shapes():
    cfg = make_tiny_cfg()
    wc = cfg.wavernn
    torch.manual_seed(1)
    model = TorchWaveRNN(
        wc.rnn_dims, wc.fc_dims, cfg.audio.bits, wc.pad, wc.upsample_factors,
        cfg.audio.num_mels, wc.compute_dims, wc.res_out_dims, wc.res_blocks,
    )
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    bad = dict(state, **{"fc3.weight": state["fc3.weight"][:, :-1]})
    with pytest.raises((ValueError, KeyError)):
        import_state_dict(cfg, bad)
