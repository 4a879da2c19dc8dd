"""Logits-level parity vs a PyTorch reference implementation.

Builds the reference family's DeepSpeech architecture in torch (from
the SURVEY.md §4.4 spec — NOT copied code), imports its state_dict via
tpuasr.compat, and checks logits match at B=1 (no padding, eval mode),
which is the north star's "logits match the reference within
tolerance" contract. Torch runs on CPU (baked into the image).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuasr.compat.torch_import import import_torch_state_dict  # noqa: E402
from tpuasr.model.ds2 import DeepSpeech2, ModelConfig  # noqa: E402


class _SeqWrap(tnn.Module):
    def __init__(self, module):
        super().__init__()
        self.module = module


class _MaskConvNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.seq_module = tnn.Sequential(
            tnn.Conv2d(1, 32, (41, 11), stride=(2, 2), padding=(20, 5),
                       bias=False),
            tnn.BatchNorm2d(32),
            tnn.Hardtanh(0, 20, inplace=False),
            tnn.Conv2d(32, 32, (21, 11), stride=(2, 1), padding=(10, 5),
                       bias=False),
            tnn.BatchNorm2d(32),
            tnn.Hardtanh(0, 20, inplace=False),
        )

    def forward(self, x):
        return self.seq_module(x)


class _BatchRNN(tnn.Module):
    def __init__(self, in_size, hidden, batch_norm):
        super().__init__()
        self.batch_norm = (
            _SeqWrap(tnn.BatchNorm1d(in_size)) if batch_norm else None
        )
        self.rnn = tnn.GRU(in_size, hidden, bidirectional=True, bias=True)

    def forward(self, x):  # x: (T, B, H_in)
        if self.batch_norm is not None:
            t, b, h = x.shape
            x = self.batch_norm.module(x.reshape(t * b, h)).reshape(t, b, h)
        x, _ = self.rnn(x)
        t, b, h2 = x.shape
        x = x.view(t, b, 2, h2 // 2).sum(2)  # direction-sum
        return x


class _TorchDS2(tnn.Module):
    """deepspeech.pytorch-family architecture, written from the spec."""

    def __init__(self, n_feat=161, hidden=32, layers=2, n_class=10):
        super().__init__()
        self.conv = _MaskConvNet()
        f_out = ((n_feat + 2 * 20 - 41) // 2 + 1)
        f_out = (f_out + 2 * 10 - 21) // 2 + 1
        in_size = f_out * 32
        rnns = []
        for i in range(layers):
            rnns.append(_BatchRNN(in_size if i == 0 else hidden, hidden,
                                  batch_norm=(i > 0)))
        self.rnns = tnn.ModuleList(rnns)
        self.fc = tnn.ModuleList([
            _SeqWrap(tnn.Sequential(
                tnn.BatchNorm1d(hidden),
                tnn.Linear(hidden, n_class, bias=False),
            ))
        ])

    def forward(self, spect):  # (B, 1, F, T)
        x = self.conv(spect)
        b, c, f, t = x.shape
        x = x.view(b, c * f, t).permute(2, 0, 1)  # (T, B, C*F)
        for rnn in self.rnns:
            x = rnn(x)
        t, b, h = x.shape
        x = self.fc[0].module(x.reshape(t * b, h)).reshape(t, b, -1)
        return x.transpose(0, 1)  # (B, T, C) raw logits


@pytest.mark.parametrize("t_in", [40, 37])
def test_logits_parity_b1(t_in):
    torch.manual_seed(0)
    tm = _TorchDS2(hidden=32, layers=2, n_class=10).eval()
    # randomize BN running stats so eval BN is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    cfg = ModelConfig(n_classes=10, hidden_size=32, hidden_layers=2,
                      compute_dtype=jnp.float32)
    variables, unused = import_torch_state_dict(tm.state_dict(), cfg)
    assert unused == [], unused

    rng = np.random.RandomState(1)
    feats = rng.randn(1, t_in, 161).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.from_numpy(feats.transpose(0, 2, 1))[:, None])
    ref = ref.numpy()

    model = DeepSpeech2(cfg)
    ours, out_len = model.apply(
        jax.tree.map(jnp.asarray, variables),
        jnp.asarray(feats),
        jnp.asarray(np.array([t_in], np.int32)),
        train=False,
    )
    ours = np.asarray(ours)
    t_out = int(out_len[0])
    assert ref.shape[1] == t_out
    np.testing.assert_allclose(ours[0, :t_out], ref[0], rtol=2e-4, atol=2e-4)


def test_load_torch_package(tmp_path):
    """Round-trip a reference-style .pth package through the loader."""
    from tpuasr.compat.torch_import import load_torch_package

    torch.manual_seed(1)
    tm = _TorchDS2(hidden=32, layers=2, n_class=42).eval()
    pth = str(tmp_path / "ref.pth")
    labels = list("_'ABCDEFGHIJKLMNOPQRSTUVWXYZÀÁÂÃÇÉÊÍÓÔÕÚÜ ")
    torch.save({
        "hidden_size": 32, "hidden_layers": 2, "rnn_type": "gru",
        "bidirectional": True, "labels": labels,
        "audio_conf": {"sample_rate": 16000, "window_size": 0.02,
                       "window_stride": 0.01, "window": "hamming"},
        "state_dict": tm.state_dict(),
        "epoch": 7, "loss_results": [3.0, 2.0],
    }, pth)

    pkg = load_torch_package(pth)
    assert pkg.model_config.hidden_size == 32
    assert pkg.alphabet.size == 42
    assert pkg.epoch == 7

    # loaded package produces the same logits as torch
    rng = np.random.RandomState(5)
    feats = rng.randn(1, 40, 161).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(feats.transpose(0, 2, 1))[:, None]).numpy()
    model = DeepSpeech2(pkg.model_config.__class__(
        **{**pkg.model_config.__dict__, "compute_dtype": jnp.float32}))
    ours, out_len = model.apply(
        jax.tree.map(jnp.asarray, pkg.variables),
        jnp.asarray(feats), jnp.asarray(np.array([40], np.int32)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(ours)[0, : int(out_len[0])],
                               ref[0], rtol=2e-4, atol=2e-4)
