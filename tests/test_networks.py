"""TDNN and AudioNet vs torch oracles built from the published architectures
(x-vector: Snyder et al. / pytorch_xvectors; AudioNet: arXiv:1807.03418)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from speakerguard_tpu.models.tdnn import (  # noqa: E402
    random_tdnn, tdnn_embedding, tdnn_forward, load_tdnn_from_torch_state)
from speakerguard_tpu.models import audionet as an  # noqa: E402


class TorchXvec(nn.Module):
    """Oracle x-vector TDNN (standard published architecture)."""

    def __init__(self, num_spks):
        super().__init__()
        spec = [(30, 512, 5, 1), (512, 512, 5, 2), (512, 512, 7, 3),
                (512, 512, 1, 1), (512, 1500, 1, 1)]
        self.convs = nn.ModuleList(
            [nn.Conv1d(i, o, k, dilation=d) for i, o, k, d in spec])
        self.bns = nn.ModuleList(
            [nn.BatchNorm1d(o, momentum=0.1, affine=False)
             for _, o, _, _ in spec])
        self.fc1 = nn.Linear(3000, 512)
        self.bn_fc1 = nn.BatchNorm1d(512, momentum=0.1, affine=False)
        self.fc2 = nn.Linear(512, 512)
        self.bn_fc2 = nn.BatchNorm1d(512, momentum=0.1, affine=False)
        self.fc3 = nn.Linear(512, num_spks)

    def embedding(self, x):
        for conv, bn in zip(self.convs, self.bns):
            x = bn(F.relu(conv(x)))
        stats = torch.cat((x.mean(dim=2), x.std(dim=2)), dim=1)
        return self.fc1(stats)

    def forward(self, x):
        x = self.embedding(x)
        x = self.bn_fc1(F.relu(x))
        x = self.bn_fc2(F.relu(self.fc2(x)))
        return self.fc3(x)

    def state_for_loader(self):
        sd = {}
        for i, (conv, bn) in enumerate(zip(self.convs, self.bns), start=1):
            sd[f"tdnn{i}.weight"] = conv.weight
            sd[f"tdnn{i}.bias"] = conv.bias
            sd[f"bn_tdnn{i}.running_mean"] = bn.running_mean
            sd[f"bn_tdnn{i}.running_var"] = bn.running_var
        for name in ("fc1", "fc2", "fc3"):
            sd[f"{name}.weight"] = getattr(self, name).weight
            sd[f"{name}.bias"] = getattr(self, name).bias
        sd["bn_fc1.running_mean"] = self.bn_fc1.running_mean
        sd["bn_fc1.running_var"] = self.bn_fc1.running_var
        sd["bn_fc2.running_mean"] = self.bn_fc2.running_mean
        sd["bn_fc2.running_var"] = self.bn_fc2.running_var
        return sd


def test_tdnn_matches_torch(rng):
    torch.manual_seed(0)
    net = TorchXvec(num_spks=7).eval()
    # randomize running stats so bn isn't identity
    for bn in list(net.bns) + [net.bn_fc1, net.bn_fc2]:
        bn.running_mean.normal_(0, 0.1)
        bn.running_var.uniform_(0.5, 1.5)
    params = load_tdnn_from_torch_state(net.state_for_loader())

    feats = rng.standard_normal((2, 64, 30)).astype(np.float32)
    with torch.no_grad():
        want_emb = net.embedding(
            torch.from_numpy(feats).transpose(1, 2)).numpy()
        want_logits = net(torch.from_numpy(feats).transpose(1, 2)).numpy()

    got_emb = np.asarray(tdnn_embedding(params, jnp.asarray(feats)))
    got_logits = np.asarray(tdnn_forward(params, jnp.asarray(feats)))
    np.testing.assert_allclose(got_emb, want_emb, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(got_logits, want_logits, rtol=1e-3, atol=1e-3)


class TorchAudioNet(nn.Module):
    """Oracle AudioNet conv stack (arXiv:1807.03418 adaption), with the
    reference's state_dict layout (conv1..conv8, fc)."""

    def __init__(self, num_class):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(1, 1, kernel_size=[5, 5], stride=1, padding=[2, 2]),
            nn.BatchNorm2d(1))
        spec = [(32, 64, 1, True), (64, 128, 1, False), (128, 128, 1, False),
                (128, 128, 1, True), (128, 128, 1, False), (128, 64, 1, True),
                (64, 32, 0, False)]
        for i, (cin, cout, pad, pool) in enumerate(spec, start=2):
            layers = [nn.Conv1d(cin, cout, 3, padding=pad),
                      nn.BatchNorm1d(cout), nn.ReLU()]
            if pool:
                layers.append(nn.MaxPool1d(2, stride=2))
            setattr(self, f"conv{i}", nn.Sequential(*layers))
        self.fc = nn.Linear(32, num_class)

    @property
    def blocks(self):
        return [getattr(self, f"conv{i}") for i in range(2, 9)]

    def forward(self, x):  # x: (B, F=32, T)
        x = self.conv1(x.unsqueeze(1)).squeeze(1)
        for blk in self.blocks:
            x = blk(x)
        x, _ = x.max(2)
        return self.fc(x)


def _params_from_torch(net: TorchAudioNet):
    """Via the production torch-state converter (the reference state_dict
    layout round-trips through it)."""
    return an.load_audionet_from_torch_state(net.state_dict())


def test_audionet_matches_torch(rng):
    torch.manual_seed(1)
    net = TorchAudioNet(num_class=5).eval()
    params, state = _params_from_torch(net)

    feats = rng.standard_normal((2, 50, 32)).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(feats).transpose(1, 2)).numpy()
    got, _, _ = an.audionet_logits(params, state, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_audionet_repeat_if_short(rng):
    torch.manual_seed(2)
    params, state = an.init_audionet(rng, num_class=5)
    # T=20 -> after 3 pools: 20->10->5->2, triggers repeat (2 < 3)
    feats = rng.standard_normal((2, 20, 32)).astype(np.float32)
    logits, _, _ = an.audionet_logits(params, state, jnp.asarray(feats))
    assert np.isfinite(np.asarray(logits)).all()


def test_audionet_train_updates_state(rng):
    params, state = an.init_audionet(rng, num_class=5)
    feats = rng.standard_normal((4, 50, 32)).astype(np.float32)
    _, _, new_state = an.audionet_logits(params, state, jnp.asarray(feats),
                                         train=True)
    assert not np.allclose(np.asarray(new_state.means[0]),
                           np.asarray(state.means[0]))
