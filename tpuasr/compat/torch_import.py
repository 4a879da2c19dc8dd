"""Import deepspeech.pytorch-family checkpoints into tpuasr.

Reference parity: the reference's ``.pth`` package stores a torch
``state_dict`` for ref:model.py's DeepSpeech (SURVEY.md §5.4). This
module maps those tensors onto tpuasr's flax parameter tree so
reference-trained weights can be evaluated here — the mechanism behind
the north star's "logits match the reference within tolerance" check
(BASELINE.json) and the WER-delta comparison.

Layout conventions handled (torch -> tpuasr):
  * Conv2d ``(out, in, kF, kT)`` over (freq, time) -> NHWC HWIO with
    time-major spatial dims ``(kT, kF, in, out)``.
  * GRU/LSTM ``weight_ih_l0 (G*H, H_in)`` -> ``input_kernel (H_in, G*H)``
    (gate order r,z,n / i,f,g,o is IDENTICAL — both follow cuDNN).
    Forward/reverse directions stack into the leading axis of the
    direction-batched BiRecurrentCore parameters.
  * BatchNorm {weight, bias, running_mean, running_var} ->
    {scale, bias} params + {mean, var} batch_stats.

Expected torch key names follow the deepspeech.pytorch family:
  conv.seq_module.{0,3}.*           conv layers
  conv.seq_module.{1,4}.*           conv batch norms
  rnns.{i}.batch_norm.module.*      pre-RNN seq-wise BN (i >= 1)
  rnns.{i}.rnn.{weight,bias}_{ih,hh}_l0[_reverse]
  fc.0.module.0.*                   head BN
  fc.0.module.1.weight              head Linear (C, H)
Unknown keys are reported, not silently dropped.
"""

from __future__ import annotations

import numpy as np

from tpuasr.model.ds2 import ModelConfig, conv_out_features


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    # copy=True: torch optimizers update parameters IN PLACE and
    # tensor.numpy() shares memory — an imported tree must be a
    # snapshot, not a live view of the torch model.
    return np.array(x, dtype=np.float32, copy=True)


def import_torch_state_dict(
    state_dict: dict, cfg: ModelConfig
) -> tuple[dict, list]:
    """torch state_dict (tensors or ndarrays) -> {"params", "batch_stats"}.

    Returns (variables, unused_keys).
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    params: dict = {}
    stats: dict = {}

    # ---- conv stack: seq indices 0/1 (conv/bn) and 3/4 ----
    for i, conv_idx in enumerate((0, 3)):
        w = take(f"conv.seq_module.{conv_idx}.weight")  # (out,in,kF,kT)
        params[f"conv{i}"] = {
            "Conv_0": {"kernel": w.transpose(3, 2, 1, 0)},  # (kT,kF,in,out)
            "MaskedBatchNorm_0": {
                "scale": take(f"conv.seq_module.{conv_idx + 1}.weight"),
                "bias": take(f"conv.seq_module.{conv_idx + 1}.bias"),
            },
        }
        stats[f"conv{i}"] = {
            "MaskedBatchNorm_0": {
                "mean": take(f"conv.seq_module.{conv_idx + 1}.running_mean"),
                "var": take(f"conv.seq_module.{conv_idx + 1}.running_var"),
            }
        }

    # The reference flattens conv output channel-major (C*F' features,
    # index c*F'+f); tpuasr flattens NHWC feature-major (index f*C+c).
    # Permute the first RNN layer's input rows accordingly.
    ch = cfg.conv_channels
    f_out = conv_out_features(cfg.n_features, ch) // ch
    # ours_row (f*C + c) reads torch_row (c*F' + f)
    perm = np.array(
        [c * f_out + f for f in range(f_out) for c in range(ch)], np.int64
    )

    def fix_l0(w_ih_t, layer):  # (H_in, G*H) already transposed to ours
        return w_ih_t[perm] if layer == 0 else w_ih_t

    # ---- recurrent stack ----
    for i in range(cfg.hidden_layers):
        layer_p: dict = {}
        layer_s: dict = {}
        bn_key = f"rnns.{i}.batch_norm.module"
        if f"{bn_key}.weight" in sd:
            layer_p["MaskedBatchNorm_0"] = {
                "scale": take(f"{bn_key}.weight"),
                "bias": take(f"{bn_key}.bias"),
            }
            layer_s["MaskedBatchNorm_0"] = {
                "mean": take(f"{bn_key}.running_mean"),
                "var": take(f"{bn_key}.running_var"),
            }
        if cfg.bidirectional:
            w_ih = np.stack(
                [fix_l0(take(f"rnns.{i}.rnn.weight_ih_l0").T, i),
                 fix_l0(take(f"rnns.{i}.rnn.weight_ih_l0_reverse").T, i)]
            )  # (2, H_in, G*H)
            w_hh = np.stack(
                [take(f"rnns.{i}.rnn.weight_hh_l0").T,
                 take(f"rnns.{i}.rnn.weight_hh_l0_reverse").T]
            )
            b_ih = np.stack(
                [take(f"rnns.{i}.rnn.bias_ih_l0"),
                 take(f"rnns.{i}.rnn.bias_ih_l0_reverse")]
            )
            b_hh = np.stack(
                [take(f"rnns.{i}.rnn.bias_hh_l0"),
                 take(f"rnns.{i}.rnn.bias_hh_l0_reverse")]
            )
            layer_p["bi"] = {
                "input_kernel": w_ih,
                "input_bias": b_ih,
                "recurrent_kernel": w_hh,
                "recurrent_bias": b_hh,
            }
        else:
            layer_p["fwd"] = {
                "input_proj": {
                    "kernel": fix_l0(take(f"rnns.{i}.rnn.weight_ih_l0").T, i),
                    "bias": take(f"rnns.{i}.rnn.bias_ih_l0"),
                },
                "recurrent_kernel": take(f"rnns.{i}.rnn.weight_hh_l0").T,
                "recurrent_bias": take(f"rnns.{i}.rnn.bias_hh_l0"),
            }
        params[f"rnn{i}"] = layer_p
        if layer_s:
            stats[f"rnn{i}"] = layer_s

    # ---- lookahead (unidirectional models only; ref:model.py
    # Lookahead wrapped in nn.Sequential with Hardtanh) ----
    if not cfg.bidirectional:
        for key in ("lookahead.0.weight", "lookahead.weight"):
            if key in sd:
                w = take(key)
                if w.ndim == 2:  # old Parameter style (H, K)
                    w = w[:, None, :]
                # torch (H, 1, K) grouped conv -> flax kernel (K, 1, H)
                params["lookahead"] = {
                    "Conv_0": {"kernel": w.transpose(2, 1, 0)}
                }
                break

    # ---- head: SequenceWise(BN -> Linear) ----
    params["head_bn"] = {
        "scale": take("fc.0.module.0.weight"),
        "bias": take("fc.0.module.0.bias"),
    }
    stats["head_bn"] = {
        "mean": take("fc.0.module.0.running_mean"),
        "var": take("fc.0.module.0.running_var"),
    }
    params["head"] = {"kernel": take("fc.0.module.1.weight").T}

    unused = [
        k for k in sd
        if k not in used and not k.endswith("num_batches_tracked")
    ]
    return {"params": params, "batch_stats": stats}, unused


def load_torch_package(path: str):
    """Load a reference-family ``.pth`` checkpoint package
    (DeepSpeech.serialize format: hyperparams + labels + audio_conf +
    state_dict, SURVEY.md §5.4) into a tpuasr CheckpointPackage, so
    ``transcribe``/``test`` can run reference-trained models directly.
    """
    import torch

    from tpuasr.audio.frontend import FrontendConfig
    from tpuasr.train.checkpoint import CheckpointPackage

    pkg = torch.load(path, map_location="cpu", weights_only=False)
    labels = pkg.get("labels")
    if isinstance(labels, (list, tuple)):
        labels = "".join(labels)
    audio_conf = pkg.get("audio_conf", {})
    frontend_cfg = FrontendConfig(
        sample_rate=int(audio_conf.get("sample_rate", 16000)),
        window_size=float(audio_conf.get("window_size", 0.02)),
        window_stride=float(audio_conf.get("window_stride", 0.01)),
        window=str(audio_conf.get("window", "hamming")),
    )
    bidirectional = bool(pkg.get("bidirectional", True))
    # unidirectional models: adopt the lookahead kernel width from the
    # checkpoint's own weights (the package has no explicit field)
    lookahead_context = 20
    if not bidirectional:
        for key in ("lookahead.0.weight", "lookahead.weight"):
            if key in pkg["state_dict"]:
                lookahead_context = int(pkg["state_dict"][key].shape[-1])
                break
        else:
            lookahead_context = 0
    model_cfg = ModelConfig(
        n_classes=len(labels),
        n_features=frontend_cfg.n_features,
        hidden_size=int(pkg.get("hidden_size", 800)),
        hidden_layers=int(pkg.get("hidden_layers", 5)),
        rnn_type=str(pkg.get("rnn_type", "gru")).lower(),
        bidirectional=bidirectional,
        lookahead_context=lookahead_context,
    )
    variables, unused = import_torch_state_dict(pkg["state_dict"], model_cfg)
    if unused:
        raise ValueError(f"unmapped torch keys: {unused[:8]}...")
    return CheckpointPackage(
        model_config=model_cfg,
        frontend_config=frontend_cfg,
        labels=labels,
        variables=variables,
        epoch=int(pkg.get("epoch", 0)),
        loss_history=[float(x) for x in np.atleast_1d(
            np.asarray(pkg.get("loss_results", []), dtype=np.float64)
        ) if np.isfinite(x)],
    )
