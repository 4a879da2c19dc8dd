"""Streaming (incremental) transcription for unidirectional models.

The reference family has no streaming mode; its unidirectional
DeepSpeech variant with a Lookahead layer exists precisely to enable
one (DS2 paper, ref:model.py Lookahead — SURVEY.md §3.1). This module
supplies it TPU-first: ONE jitted step function with static shapes
processes a fixed-size audio chunk per call and carries exact model
state between calls, so a live stream compiles exactly one graph.

Design (overlap-recompute + explicit carries):
  * Convolutions are STATELESS here: each step recomputes conv1/conv2
    over a small carried window of past frames (kernel-minus-stride
    overlaps: 9 feature frames, 10 conv1 frames), so conv outputs are
    identical to the offline model's by construction. No bespoke
    "streaming conv" arithmetic to get wrong.
  * The only true state is what the offline model also carries along
    time: the RNN hidden state per layer (exact), the Lookahead delay
    buffer (the layer needs ``context - 1`` future frames), and the
    causal feature-normalization statistics.
  * Every chunk emits a constant ``chunk_frames // 2`` logit frames
    (conv1 halves time). Out-of-domain positions at the stream edges
    are masked by absolute-index comparisons driven by traced scalars,
    so the same compiled graph serves startup, steady state, and flush.

Exactness: with ``normalize=False`` the streamed logits equal the
offline model's logits for the same wave (same parameters, same
masking semantics; tests/test_stream.py asserts it). With
``normalize=True`` the offline model normalizes with WHOLE-utterance
statistics — non-causal by definition — so streaming uses running
(causal) statistics instead: each chunk is normalized by the
statistics of everything heard so far. This is the standard streaming
deviation, documented in OPERATIONS.md.

Latency: algorithmic delay = conv right context (5 conv2 frames +
2 conv1 frames) + lookahead context (default 20 frames at 20 ms)
≈ 0.5 s, plus the chunk granularity (chunk_frames x 10 ms).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tpuasr.audio.frontend import FrontendConfig, _dft_mats, _window_np
from tpuasr.model.ds2 import CONV_SPECS, ModelConfig

__all__ = ["StreamingTranscriber", "MultiStreamTranscriber"]


def _first_lead(take: np.ndarray, hop: int) -> np.ndarray:
    """Chunk 0's lead: frame 0 left-reflects (librosa center=True)."""
    lead = np.zeros((hop,), np.float32)
    n = min(hop, len(take) - 1)
    if n > 0:
        lead[-n:] = take[1:n + 1][::-1]
    return lead


def _reflect_tail(recent: np.ndarray, l: int, t_f: int, hop: int,
                  half: int, tail_len: int) -> np.ndarray:
    """End-of-stream extension: right-REFLECT the last samples so the
    final frame reads its offline center=True window (mirrors
    frontend.frame_signal's one-frame fixup), zeros beyond."""
    tail = np.zeros((tail_len,), np.float32)
    end = (t_f - 1) * hop + half
    base = l - len(recent)
    for i in range(l, end):
        p = 2 * (l - 1) - i
        if 0 <= p - base < len(recent):
            tail[i - l] = recent[p - base]
    return tail


def _init_carry(cfg: ModelConfig, fe: FrontendConfig, b: int,
                prime_stats: tuple | None = None):
    """Zero streaming carry for a batch of ``b`` streams (see
    _build_step for the layout).

    ``prime_stats`` = (mean, var, weight_frames): seed the causal
    feature-normalization accumulators with ``weight_frames`` pseudo-
    frames of corpus-level statistics, so a stream's first frames are
    normalized near the stats the offline (whole-utterance) frontend
    would use instead of its own few frames. The running estimate
    still converges to the utterance's own stats as audio accrues.
    Mitigation for the streaming-vs-offline normalize deviation —
    measured in PARITY.md (use audio.frontend.corpus_feature_stats)."""
    kt1, kf1, st1, sf1, _, pf1 = CONV_SPECS[0]
    kt2, _, st2, _, _, _ = CONV_SPECS[1]
    f1 = (fe.n_features + 2 * pf1 - kf1) // sf1 + 1
    h, dt = cfg.hidden_size, cfg.compute_dtype
    hs = []
    for _ in range(cfg.hidden_layers):
        shape = (2, b, h) if cfg.rnn_type == "lstm" else (b, h)
        hs.append(jnp.zeros(shape, dt))
    n_cnt = n_sum = n_sq = jnp.zeros((b,), jnp.float32)
    if prime_stats is not None:
        mean, var, w_frames = (float(x) for x in prime_stats)
        cells = w_frames * fe.n_features  # accumulators count cells
        n_cnt = jnp.full((b,), cells, jnp.float32)
        n_sum = jnp.full((b,), cells * mean, jnp.float32)
        n_sq = jnp.full((b,), cells * (var + mean * mean), jnp.float32)
    return (
        jnp.zeros((b, kt1 - st1, fe.n_features), dt),
        jnp.zeros((b, kt2 - st2, f1, cfg.conv_channels), jnp.float32),
        jnp.zeros((b, max(cfg.lookahead_context - 1, 1), h),
                  jnp.float32),
        hs,
        n_cnt,
        n_sum,
        n_sq,
    )


def _greedy_emit(rows: np.ndarray, lo: int, hi: int, last_id: int,
                 labels, blank_id: int,
                 base_w: int = 0) -> tuple[str, int, list[int]]:
    """CTC greedy collapse over finalized logit rows [lo, hi); also
    reports each emitted character's ABSOLUTE conv-frame offset
    (base_w + row index — identical to the offline GreedyDecoder's
    per-character offsets)."""
    parts: list[str] = []
    offs: list[int] = []
    for j in range(lo, hi):
        cid = int(np.argmax(rows[j]))
        if cid != blank_id and cid != last_id:
            parts.append(labels[cid])
            offs.append(base_w + j)
        last_id = cid
    return "".join(parts), last_id, offs


def _beam_emit(beams, committed: tuple, rows: np.ndarray, lo: int,
               hi: int, alphabet, beam_kw: dict, base_w: int = 0):
    """Advance an incremental host prefix-beam over finalized logit
    rows [lo, hi); emit the newly-STABLE text (the common prefix of
    every live beam, past what was already committed). ``base_w`` is
    row lo..hi's absolute conv-frame base (frames tracking). Returns
    (frag, beams, committed, offs) — offs are the newly committed
    chars' emission frames (the best beam's alignment)."""
    from tpuasr.decode.beam_host import beam_step

    for j in range(lo, hi):
        row = rows[j].astype(np.float64)
        lp = row - np.log(np.sum(np.exp(row - row.max()))) - row.max()
        beams = beam_step(beams, lp, alphabet, t=base_w + j, **beam_kw)
    keys = list(beams.keys())
    lcp = keys[0]
    for k2 in keys[1:]:
        n = 0
        for a, b2 in zip(lcp, k2):
            if a != b2:
                break
            n += 1
        lcp = lcp[:n]
    frag = ""
    offs: list[int] = []
    if len(lcp) > len(committed) and lcp[:len(committed)] == committed:
        frag = alphabet.decode(lcp[len(committed):])
        best = max(beams.items(),
                   key=lambda kv: _lse_pair(kv[1][0], kv[1][1]) + kv[1][2])
        offs = list(best[1][4][len(committed):len(lcp)])
        committed = lcp
    return frag, beams, committed, offs


def _lse_pair(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b <= -5e29:
        return a
    return a + float(np.log1p(np.exp(b - a)))


def _native_emit(session, committed: tuple, rows: np.ndarray, lo: int,
                 hi: int, alphabet):
    """Advance a NativeBeamSession over finalized logit rows [lo, hi)
    and emit the newly-stable text (same contract as _beam_emit; the
    session's internal frame counter is the absolute conv frame since
    streams feed rows contiguously from frame 0)."""
    r = rows[lo:hi].astype(np.float64)  # normalize in f64 like the
    m = r.max(axis=-1, keepdims=True)   # host path; feed casts to f32
    lp = r - m - np.log(np.sum(np.exp(r - m), axis=-1, keepdims=True))
    session.feed(lp)
    lcp_ids, lcp_frames = session.prefix_with_frames()
    lcp = tuple(int(x) for x in lcp_ids)
    frag = ""
    offs: list[int] = []
    if len(lcp) > len(committed) and lcp[:len(committed)] == committed:
        frag = alphabet.decode(list(lcp[len(committed):]))
        offs = [int(x) for x in lcp_frames[len(committed):]]
        committed = lcp
    return frag, committed, offs


def _native_session_factory(decoder: str, beam_impl: str, alphabet,
                            beam_kw: dict):
    """Factory for stateful C++ beam sessions (None = use the Python
    host beam). "auto" probes one construction — lib build + one-time
    LM conversion — and falls back silently; "native" raises on
    failure."""
    if decoder != "beam" or beam_impl == "host":
        return None
    try:
        from tpuasr.decode.native import NativeBeamSession

        def mk():
            return NativeBeamSession(
                alphabet, lm=beam_kw["lm"], alpha=beam_kw["alpha"],
                beta=beam_kw["beta"], beam_width=beam_kw["beam_width"],
                cutoff_top_n=beam_kw["cutoff_top_n"],
                cutoff_prob=beam_kw["cutoff_prob"],
                prune_logp=beam_kw["prune_logp"])

        mk()  # probe
        return mk
    except Exception:
        if beam_impl == "native":
            raise
        return None


def _beam_final(beams, committed_text: str, alphabet, beam_kw: dict):
    """Finalize an incremental beam: best beam text, closing the last
    partial word against the LM. Returns (extra_text, full_text) —
    on the rare retraction (the final text does not extend the
    committed prefix) extra == full and the caller must REPLACE its
    committed text."""
    from tpuasr.decode.beam_host import beam_results

    final, _, frames = beam_results(beams, alphabet, lm=beam_kw["lm"],
                                    alpha=beam_kw["alpha"],
                                    beta=beam_kw["beta"],
                                    with_offsets=True)[0]
    if final.startswith(committed_text):
        return final[len(committed_text):], final, frames
    return final, final, frames  # retraction: final text authoritative


def _bn_eval(x, params, stats, eps=1e-5):
    """MaskedBatchNorm in eval mode: pure per-position affine (running
    statistics; see model.ds2.MaskedBatchNorm)."""
    xf = x.astype(jnp.float32)
    y = (xf - stats["mean"]) * jax.lax.rsqrt(stats["var"] + eps)
    return y * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )


def _conv_block(x, params, stats, spec, mask, dtype):
    """One MaskedConvBlock (eval) over a frame WINDOW with VALID time
    padding (the window already contains the needed context); freq
    padding stays the offline symmetric pad. ``mask``: (B, T_out)
    validity of each output's absolute position."""
    kt, kf, st, sf, pt, pf = spec
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        params["Conv_0"]["kernel"].astype(dtype),
        window_strides=(st, sf),
        padding=((0, 0), (pf, pf)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = _bn_eval(y, params["MaskedBatchNorm_0"], stats["MaskedBatchNorm_0"])
    y = jnp.clip(y, 0.0, 20.0)
    return y * mask[:, :, None, None]


def _rnn_chunk(x, h0, params, rnn_type, mask, dtype):
    """RecurrentCore math over a chunk: hoisted input projection + a
    masked scan from carry ``h0``. Mirrors model.ds2.RecurrentCore
    (gate order r,z,n / i,f,g,o) so parameters interop exactly."""
    w_x = params["input_proj"]["kernel"].astype(dtype)
    b_x = params["input_proj"]["bias"].astype(dtype)
    w_h = params["recurrent_kernel"].astype(dtype)
    b_h = params["recurrent_bias"].astype(dtype)
    xg = jnp.einsum("bti,ig->btg", x.astype(dtype), w_x) + b_x
    xg_t = jnp.swapaxes(xg, 0, 1)  # (T, B, G*H)
    m_t = jnp.swapaxes(mask, 0, 1)[:, :, None].astype(dtype)

    def step(carry, inp):
        xg_s, m = inp
        if rnn_type == "lstm":
            hc, cc = carry
            gates = xg_s + jnp.dot(hc, w_h, preferred_element_type=dtype) + b_h
            i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
            c_new = (jax.nn.sigmoid(f_) * cc
                     + jax.nn.sigmoid(i_) * jnp.tanh(g_))
            h_new = jax.nn.sigmoid(o_) * jnp.tanh(c_new)
            hc = m * h_new + (1 - m) * hc
            cc = m * c_new + (1 - m) * cc
            return (hc, cc), hc
        hc = carry
        hg = jnp.dot(hc, w_h, preferred_element_type=dtype) + b_h
        if rnn_type == "gru":
            xr, xz, xn = jnp.split(xg_s, 3, axis=-1)
            hr, hz, hn = jnp.split(hg, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n_ = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n_ + z * hc
        else:
            h_new = jnp.tanh(xg_s + hg)
        hc = m * h_new + (1 - m) * hc
        return hc, hc

    carry0 = (h0[0], h0[1]) if rnn_type == "lstm" else h0
    carry1, ys = jax.lax.scan(step, carry0, (xg_t, m_t))
    ys = jnp.swapaxes(ys, 0, 1) * mask[:, :, None].astype(dtype)
    h1 = jnp.stack(carry1) if rnn_type == "lstm" else carry1
    return ys, h1


def _build_step(model_cfg: ModelConfig, frontend_cfg: FrontendConfig,
                chunk_frames: int):
    """Compile-once streaming step.

    step(variables, carry, window, k, t_f, t1) ->
        (logits (B, D, C) f32, carry')
    with D = chunk_frames // 2. ``window`` is the (B,
    (chunk_frames+1)*hop) sample window whose hop-blocks are
    [lead | chunk] for feature frames [k*T1c, (k+1)*T1c); ``t_f`` and
    ``t1`` are the true total feature/conv frame counts (pass a large
    sentinel while the stream is open). Emitted logits are for
    absolute conv-frame indices base_w(k) + [0, D); the host keeps
    rows with 0 <= w < t1.
    """
    cfg, fe = model_cfg, frontend_cfg
    if cfg.bidirectional:
        raise ValueError("streaming needs a unidirectional model "
                         "(bidirectional=False); the backward direction "
                         "is anti-causal by definition")
    if chunk_frames % 2 or chunk_frames < 2:
        raise ValueError("chunk_frames must be a positive multiple of 2")
    if fe.n_fft != 2 * fe.hop:
        raise ValueError("streaming framing assumes n_fft == 2*hop "
                         "(the reference 20ms/10ms configuration)")
    (kt1, _, st1, _, pt1, _), (kt2, _, st2, _, pt2, _) = CONV_SPECS
    delta = chunk_frames // st1          # conv frames emitted per step
    d1 = (kt1 - st1 - pt1) // st1        # conv1 startup lead (=2)
    d2 = kt2 - st2 - pt2                 # conv2 startup lead (=5)
    ctx = cfg.lookahead_context
    hop, n_fft = fe.hop, fe.n_fft
    win = jnp.asarray(_window_np(fe.window, n_fft))
    cos_m, sin_m = _dft_mats(n_fft)
    dt = cfg.compute_dtype

    def step(variables, carry, window, k, t_f, t1, active=None):
        """``k``/``t_f``/``t1`` are scalars OR per-row (B,) vectors —
        every stream in the batch may sit at its own position
        (MultiStreamTranscriber). ``active`` (B,) bool gates the carry
        update so idle rows (no data this tick) are bit-frozen."""
        params = variables["params"]
        stats = variables["batch_stats"]
        (fbuf, c1buf, labuf, hs, n_cnt, n_sum, n_sq) = carry
        b = window.shape[0]
        kv = jnp.reshape(k, (-1, 1))          # (1,1) or (B,1)
        t_f_v = jnp.reshape(t_f, (-1, 1))
        t1_v = jnp.reshape(t1, (-1, 1))

        # ---- frontend: frames -> |DFT| -> log1p -> causal normalize
        blocks = window.reshape(b, chunk_frames + 1, hop)
        frames = jnp.concatenate([blocks[:, :-1], blocks[:, 1:]], axis=-1)
        frames = frames * win
        re = jnp.dot(frames, jnp.asarray(cos_m),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        im = jnp.dot(frames, jnp.asarray(sin_m),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        feats = jnp.log1p(jnp.sqrt(re * re + im * im + 1e-30))  # (B,T1c,F)
        t_abs = kv * chunk_frames + jnp.arange(chunk_frames,
                                               dtype=jnp.int32)[None, :]
        f_valid = jnp.broadcast_to(
            (t_abs < t_f_v).astype(jnp.float32),
            (b, chunk_frames))
        if fe.normalize:
            n_f = feats.shape[-1]
            m3 = f_valid[:, :, None]
            n_cnt = n_cnt + jnp.sum(f_valid, axis=1) * n_f
            n_sum = n_sum + jnp.sum(feats * m3, axis=(1, 2))
            n_sq = n_sq + jnp.sum(feats * feats * m3, axis=(1, 2))
            cnt = jnp.maximum(n_cnt, 1.0)
            mean = n_sum / cnt
            var = jnp.maximum(n_sq / cnt - mean * mean, 1e-10)
            feats = (feats - mean[:, None, None]) \
                * jax.lax.rsqrt(var)[:, None, None]
        feats = feats * f_valid[:, :, None]

        # ---- conv1 over [9-frame carry | chunk], u = k*D - d1 + [0, D)
        fwin = jnp.concatenate([fbuf, feats.astype(dt)], axis=1)
        base_u = kv * delta - d1                         # (1,1)/(B,1)
        u_abs = base_u + jnp.arange(delta, dtype=jnp.int32)[None, :]
        u_ok = jnp.broadcast_to(
            ((u_abs >= 0) & (u_abs < t1_v))
            .astype(jnp.float32), (b, delta))
        c1 = _conv_block(fwin[:, :, :, None], params["conv0"],
                         stats["conv0"], CONV_SPECS[0], u_ok, dt)

        # ---- conv2 over [10-frame carry | new], v = base_u - d2 + [0, D)
        c1win = jnp.concatenate([c1buf, c1], axis=1)
        base_v = base_u - d2
        v_abs = base_v + jnp.arange(delta, dtype=jnp.int32)[None, :]
        v_ok = jnp.broadcast_to(
            ((v_abs >= 0) & (v_abs < t1_v))
            .astype(jnp.float32), (b, delta))
        c2 = _conv_block(c1win, params["conv1"], stats["conv1"],
                         CONV_SPECS[1], v_ok, dt)
        x = c2.reshape(b, delta, -1)

        # ---- RNN stack with carried hidden states (the true state)
        new_hs = []
        for i in range(cfg.hidden_layers):
            lp = params[f"rnn{i}"]
            if i > 0:
                x = _bn_eval(x, lp["MaskedBatchNorm_0"],
                             stats[f"rnn{i}"]["MaskedBatchNorm_0"])
                x = x * v_ok[:, :, None]
            x, h1 = _rnn_chunk(x, hs[i], lp["fwd"], cfg.rnn_type, v_ok, dt)
            new_hs.append(h1)
        x = x.astype(jnp.float32)

        # ---- Lookahead over [ctx-1 carry | new], w = v - (ctx - 1)
        if ctx > 0:
            lwin = jnp.concatenate([labuf, x], axis=1)
            kern = params["lookahead"]["Conv_0"]["kernel"]  # (ctx, 1, H)
            y = jax.lax.conv_general_dilated(
                lwin[:, :, None, :].astype(dt),
                kern[:, None].astype(dt),
                window_strides=(1, 1),
                padding=((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=lwin.shape[-1],
            )[:, :, 0, :]
            y = jnp.clip(y, 0.0, 20.0).astype(jnp.float32)
            base_w = base_v - (ctx - 1)
            new_labuf = lwin[:, -(ctx - 1):] if ctx > 1 else labuf
        else:
            y, base_w, new_labuf = x, base_v, labuf

        w_abs = base_w + jnp.arange(delta, dtype=jnp.int32)[None, :]
        w_ok = jnp.broadcast_to(
            ((w_abs >= 0) & (w_abs < t1_v))
            .astype(jnp.float32), (b, delta))
        y = _bn_eval(y, params["head_bn"], stats["head_bn"]) \
            * w_ok[:, :, None]
        logits = jnp.dot(y.astype(dt),
                         params["head"]["kernel"].astype(dt)
                         ).astype(jnp.float32)
        logits = logits * w_ok[:, :, None]

        carry1 = (fwin[:, -(kt1 - st1):], c1win[:, -(kt2 - st2):],
                  new_labuf, new_hs, n_cnt, n_sum, n_sq)
        if active is not None:
            # freeze idle rows bit-exactly (multi-stream ticks step
            # every row; only rows with real data may advance). The
            # old values come from the INPUT carry tuple — the local
            # n_cnt/n_sum/n_sq names were reassigned by the normalize
            # update above and would alias the new values here.
            carry1 = _carry_rows_select(
                active.astype(bool), carry1, carry,
                lstm=cfg.rnn_type == "lstm")
        return logits, carry1

    return jax.jit(step), delta, d1, d2


def _carry_rows_select(keep, carry_new, carry_old, lstm: bool):
    """Per-row select between two streaming carries: row b of the
    result takes carry_new where keep[b] else carry_old. hs leaves
    carry batch on axis 0 (gru/rnn: (B,H)) or axis 1 (lstm: (2,B,H));
    everything else on axis 0. The single source of truth for the
    carry layout's batch axes (used by the step's idle-row freeze AND
    slot-reuse row reset)."""
    def sel(new, old, axis=0):
        m = jnp.reshape(keep, (-1,) + (1,) * (new.ndim - 1 - axis))
        if axis:
            m = jnp.expand_dims(m, tuple(range(axis)))
        return jnp.where(m, new, old)

    h_axis = 1 if lstm else 0
    return (
        sel(carry_new[0], carry_old[0]), sel(carry_new[1], carry_old[1]),
        sel(carry_new[2], carry_old[2]),
        [sel(n, o, axis=h_axis)
         for n, o in zip(carry_new[3], carry_old[3])],
        sel(carry_new[4], carry_old[4]), sel(carry_new[5], carry_old[5]),
        sel(carry_new[6], carry_old[6]),
    )


class StreamingTranscriber:
    """Incremental greedy transcription over a live sample stream.

    >>> st = StreamingTranscriber(variables, model_cfg, frontend_cfg,
    ...                           alphabet, chunk_frames=32)
    >>> for block in mic:            # arbitrary-size float32 blocks
    ...     print(st.feed(block), end="", flush=True)
    >>> print(st.flush())

    ``feed`` returns newly FINALIZED text (greedy argmax emissions are
    final as soon as their lookahead context is complete); ``flush``
    drains the pipeline at end of stream and returns the rest. Batch
    size is 1 (the serving case); the step function itself is batched
    for future multi-stream serving.
    """

    _SENTINEL = 1 << 30

    def __init__(self, variables, model_cfg: ModelConfig,
                 frontend_cfg: FrontendConfig, alphabet,
                 chunk_frames: int = 32,
                 collect_logits: bool = False,
                 decoder: str = "greedy", lm=None, alpha: float = 0.8,
                 beta: float = 1.0, beam_width: int = 10,
                 cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                 prune_logp: float = -20.0, beam_impl: str = "auto",
                 prime_stats: tuple | None = None):
        """``decoder="beam"`` runs an incremental prefix-beam search
        (optionally with word-LM shallow fusion via ``lm``, an ArpaLM)
        over the streamed logits: ``feed`` returns the STABLE common
        prefix of all beams as it extends; ``flush`` finalizes with
        the best beam (closing the last partial word against the LM).
        Streamed fragments are provisional in beam mode — in the rare
        case a later observation overturns the committed prefix,
        ``flush`` returns the corrected full text and ``.text`` is
        always the authoritative transcript. ``beam_impl``: "native"
        (stateful C++ session) / "host" (Python beam_step) / "device"
        (the fused Pallas kernel carrying the beam state across chunks
        on device, fused into the acoustic step's dispatch) / "auto"
        (device, then native, then host). ``prime_stats`` = (mean, var,
        weight_frames) seeds the causal normalization with corpus
        statistics (see _init_carry; audio.frontend.corpus_feature_stats
        computes them)."""
        self.cfg = model_cfg
        self.fe = frontend_cfg
        self.alphabet = alphabet
        self.blank_id = alphabet.blank_id
        self.chunk_frames = chunk_frames
        self.variables = variables
        self.collect_logits = collect_logits
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"decoder must be greedy|beam, got {decoder!r}")
        self.decoder = decoder
        self._beam_kw = dict(beam_width=beam_width, lm=lm, alpha=alpha,
                             beta=beta, cutoff_top_n=cutoff_top_n,
                             cutoff_prob=cutoff_prob,
                             prune_logp=prune_logp)
        if beam_impl not in ("auto", "host", "native", "device"):
            raise ValueError(f"beam_impl must be auto|host|native|device, "
                             f"got {beam_impl!r}")
        self.prime_stats = prime_stats
        self._step, self._delta, self._d1, self._d2 = _build_step(
            model_cfg, frontend_cfg, chunk_frames
        )
        self._dev_engine = None
        if decoder == "beam" and beam_impl in ("auto", "device"):
            try:
                from tpuasr.decode.beam import DeviceBeamDecoder
                from tpuasr.decode.device_stream import DeviceBeamStreams

                dec = DeviceBeamDecoder(
                    alphabet, beam_width=beam_width, word_lm=lm,
                    alpha=alpha, beta=beta, cutoff_top_n=cutoff_top_n,
                    cutoff_prob=cutoff_prob, prune_logp=prune_logp,
                    impl="pallas" if beam_impl == "device" else "auto")
                self._dev_engine = DeviceBeamStreams(
                    dec, 1, alphabet.size, self._delta)
                _step, _adv = self._step, self._dev_engine._advance

                @jax.jit
                def step_beam(variables, carry, window, k, t_f, t1,
                              lo, lens, bstate):
                    logits, carry1 = _step(variables, carry, window,
                                           k, t_f, t1)
                    p, c, s, b1 = _adv(logits, lo, lens, bstate)
                    return carry1, logits, p, c, s, b1

                self._step_beam = step_beam
            except Exception:
                if beam_impl == "device":
                    raise
                self._dev_engine = None
        self._mk_native = None if self._dev_engine is not None else \
            _native_session_factory(
                decoder, "auto" if beam_impl == "device" else beam_impl,
                alphabet, self._beam_kw)
        self.reset()

    # ---- state management -------------------------------------------------

    def reset(self) -> None:
        self._carry = _init_carry(self.cfg, self.fe, 1, self.prime_stats)
        self._pending = np.zeros((0,), np.float32)
        self._lead = None        # previous window's last hop samples
        self._recent = np.zeros((0,), np.float32)  # for flush reflection
        self._n_samples = 0
        self._k = 0
        self._last_id = self.blank_id
        self._text_parts: list[str] = []
        self._offsets: list[int] = []  # per-char conv-frame offsets
        self._emitted = 0        # conv frames finalized so far
        self._closed = False
        self._rows: list[np.ndarray] = []  # (w, logits) when collecting
        if getattr(self, "decoder", "greedy") == "beam":
            self._committed: tuple = ()
            self._beams = None
            if self._dev_engine is not None:
                self._native = None
                self._dev_engine.reset_slot(0)
            elif getattr(self, "_native", None) is not None:
                self._native.reset()  # reuse the C++ session
            elif self._mk_native is not None:
                self._native = self._mk_native()
            else:
                self._native = None
                from tpuasr.decode.beam_host import beam_init

                self._beams = beam_init()

    # ---- streaming --------------------------------------------------------

    @property
    def text(self) -> str:
        return "".join(self._text_parts)

    @property
    def offsets(self) -> np.ndarray:
        """Per-character conv-frame offsets. Greedy: exact offline
        parity. Beam: each committed char's emission frame under the
        best beam's alignment AT COMMIT TIME (frozen like the text;
        flush replaces them wholesale on the rare retraction)."""
        return np.asarray(self._offsets, np.int64)

    def logits(self) -> np.ndarray:
        """(T1, C) assembled logits (requires collect_logits=True)."""
        if not self.collect_logits:
            raise RuntimeError("constructed with collect_logits=False")
        return np.concatenate(self._rows, axis=0) if self._rows else \
            np.zeros((0, self.cfg.n_classes), np.float32)

    def feed(self, samples: np.ndarray) -> str:
        """Append samples; run every full chunk available; return newly
        finalized text."""
        if self._closed:
            raise RuntimeError("stream is closed; call reset()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._pending = np.concatenate([self._pending, samples])
        self._n_samples += len(samples)
        self._recent = np.concatenate([self._recent, samples])[
            -(2 * self.fe.hop + 2):]
        return self._run_chunks(self._SENTINEL, self._SENTINEL)

    def flush(self) -> str:
        """End of stream: drain the pipeline, close, return the rest."""
        if self._closed:
            return ""
        hop = self.fe.hop
        l, t_f = self._n_samples, 1 + self._n_samples // self.fe.hop
        t1 = (t_f - 1) // 2 + 1
        # Extend the stream so (a) the final frame reads its offline
        # right-REFLECTED samples (librosa center=True; mirrors
        # frontend.frame_signal's one-frame fixup) and (b) enough zero
        # frames follow to drain the conv/lookahead delays. Positions
        # past the final frame's window are consumed only by masked
        # frames, so zeros are fine there.
        tail = _reflect_tail(self._recent, l, t_f, hop,
                             self.fe.n_fft // 2,
                             4 * self.chunk_frames * hop)
        self._pending = np.concatenate([self._pending, tail])
        drained = []
        while self._emitted < t1:
            drained.append(self._run_chunks(t_f, t1, max_steps=1))
            if len(self._pending) < (self.chunk_frames * hop):
                self._pending = np.concatenate([
                    self._pending,
                    np.zeros((self.chunk_frames * hop,), np.float32)])
        extra = ""
        if self.decoder == "beam":
            committed = "".join(self._text_parts)  # includes drained
            if self._dev_engine is not None:
                ids, frames, _ = self._dev_engine.finalize(0)
                final = self.alphabet.decode([int(x) for x in ids])
                extra = (final[len(committed):]
                         if final.startswith(committed) else final)
            elif self._native is not None:
                ids, frames, _ = self._native.best_with_frames()
                final = self.alphabet.decode([int(x) for x in ids])
                extra = (final[len(committed):]
                         if final.startswith(committed) else final)
            else:
                extra, final, frames = _beam_final(
                    self._beams, committed, self.alphabet, self._beam_kw)
            if extra and final.startswith(committed):
                self._text_parts.append(extra)
                self._offsets.extend(int(x) for x in
                                     frames[len(committed):])
            elif not final.startswith(committed):
                # rare retraction: the final text is authoritative
                self._text_parts = [final]
                self._offsets = [int(x) for x in frames]
                drained = []
        self._closed = True
        return "".join(drained) + extra

    def _run_chunks(self, t_f: int, t1: int, max_steps: int = 10 ** 9) -> str:
        hop = self.fe.hop
        s_chunk = self.chunk_frames * hop
        new_text: list[str] = []
        steps = 0
        dev = self._dev_engine if self.decoder == "beam" else None
        while len(self._pending) >= s_chunk and steps < max_steps:
            take = self._pending[:s_chunk]
            self._pending = self._pending[s_chunk:]
            if self._lead is None:
                self._lead = _first_lead(take, hop)
            window = np.concatenate([self._lead, take])
            self._lead = window[-hop:].copy()
            if dev is not None:
                # device beam: the beam advance rides in the SAME
                # dispatch as the acoustic step (see the multi-stream
                # tick; here with one live slot, engine batch padded)
                base_w = self._k * self._delta - self._d1 - self._d2 \
                    - max(self.cfg.lookahead_context - 1, 0)
                lo = max(0, -base_w)
                hi = min(self._delta, t1 - base_w)
                lo_v = np.asarray([lo], np.int32)
                len_v = np.asarray([max(hi - lo, 0)], np.int32)
                out = self._step_beam(
                    self.variables, self._carry,
                    jnp.asarray(window[None, :]), jnp.int32(self._k),
                    jnp.int32(t_f), jnp.int32(t1), jnp.asarray(lo_v),
                    jnp.asarray(len_v), dev.state,
                )
                fetched = jax.device_get(out[2:5])
                rows = np.asarray(out[1])[0] if self.collect_logits \
                    else None
                self._carry, dev.state = out[0], out[5]
                dev.fold(*fetched, len_v)
                self._k += 1
                ids, frames = dev.take_committed(0)
                if ids:
                    frag0 = self.alphabet.decode(ids)
                    self._committed = self._committed + tuple(ids)
                    self._offsets.extend(int(f) for f in frames)
                    new_text.append(frag0)
                if hi > lo:
                    self._emitted = base_w + hi
                    if self.collect_logits:
                        self._rows.append(rows[lo:hi])
                steps += 1
                continue
            logits, self._carry = self._step(
                self.variables, self._carry, jnp.asarray(window[None, :]),
                jnp.int32(self._k), jnp.int32(t_f), jnp.int32(t1),
            )
            self._k += 1
            base_w = (self._k - 1) * self._delta - self._d1 - self._d2 \
                - max(self.cfg.lookahead_context - 1, 0)
            rows = np.asarray(logits)[0]
            lo = max(0, -base_w)
            hi = min(self._delta, t1 - base_w)
            if self.decoder == "beam" and hi > lo:
                if self._native is not None:
                    frag0, self._committed, offs = _native_emit(
                        self._native, self._committed, rows, lo, hi,
                        self.alphabet)
                else:
                    frag0, self._beams, self._committed, offs = _beam_emit(
                        self._beams, self._committed, rows, lo, hi,
                        self.alphabet, self._beam_kw, base_w=base_w)
                self._offsets.extend(offs)
                if frag0:
                    new_text.append(frag0)
            else:
                frag0, self._last_id, offs = _greedy_emit(
                    rows, lo, hi, self._last_id, self.alphabet.labels,
                    self.blank_id, base_w=base_w)
                self._offsets.extend(offs)
                if frag0:
                    new_text.append(frag0)
            if hi > lo:
                self._emitted = base_w + hi
            if self.collect_logits and hi > lo:
                self._rows.append(rows[lo:hi])
            steps += 1
        frag = "".join(new_text)
        if frag:
            self._text_parts.append(frag)
        return frag


# ---------------------------------------------------------------------------
# Multi-stream serving: many live streams share ONE batched step
# ---------------------------------------------------------------------------


class _StreamSlot:
    """Host-side state of one live stream in a MultiStreamTranscriber."""

    __slots__ = ("pending", "lead", "recent", "n_samples", "k", "last_id",
                 "parts", "fresh", "emitted", "draining", "t_f", "t1",
                 "closed", "beams", "committed", "native", "offsets")

    def __init__(self):
        self.pending = np.zeros((0,), np.float32)
        self.lead = None
        self.recent = np.zeros((0,), np.float32)
        self.n_samples = 0
        self.k = 0
        self.last_id = -1  # set by the owner (blank_id)
        self.parts: list[str] = []
        self.fresh: list[str] = []
        self.emitted = 0
        self.draining = False
        self.t_f = 0
        self.t1 = 0
        self.closed = False
        self.beams = None       # beam mode (host impl): live beam dict
        self.committed: tuple = ()  # beam mode: stable emitted prefix
        self.native = None      # beam mode (native impl): C++ session
        self.offsets: list[int] = []  # per-char conv-frame offsets


class MultiStreamTranscriber:
    """Up to ``max_streams`` concurrent live streams decoded by ONE
    compiled batched step — the TPU-native serving design: a lone
    stream underfills the MXU, so concurrent sessions ride the batch
    dimension at near the cost of one (BASELINE.md stream scaling).

    Each stream advances independently: per-row absolute positions
    (k/t_f/t1 vectors) drive the step's masks, and an ``active`` row
    mask bit-freezes the carries of streams with no data this tick —
    so per-stream results are EXACTLY the single-stream
    StreamingTranscriber's (tests/test_stream.py asserts equality).

    >>> mst = MultiStreamTranscriber(variables, cfg, fe, alphabet)
    >>> a, b = mst.open(), mst.open()
    >>> mst.feed(a, wave_a); mst.feed(b, wave_b)
    >>> while mst.tick(): pass
    >>> mst.flush(a); mst.text(a)

    Decode is greedy (default) or an incremental host prefix-beam per
    stream (``decoder="beam"``, optional word-LM ``lm`` — see __init__;
    note the per-stream Python beam state adds host cost per tick).
    Thread safety is the caller's job (serve.py holds one lock around
    feed/tick/flush).
    """

    _SENTINEL = 1 << 30

    def __init__(self, variables, model_cfg: ModelConfig,
                 frontend_cfg: FrontendConfig, alphabet,
                 max_streams: int = 8, chunk_frames: int = 32,
                 decoder: str = "greedy", lm=None, alpha: float = 0.8,
                 beta: float = 1.0, beam_width: int = 10,
                 cutoff_top_n: int = 40, cutoff_prob: float = 1.0,
                 prune_logp: float = -20.0, beam_impl: str = "auto",
                 prime_stats: tuple | None = None):
        """``decoder="beam"`` runs an incremental prefix-beam per
        stream over the shared batched logits (optionally with word-LM
        shallow fusion via ``lm``); ticks emit each stream's stable
        common-prefix text, flush finalizes with the best beam (same
        semantics as StreamingTranscriber's beam mode, incl. the rare
        retraction where flush's full text is authoritative).

        ``beam_impl``: "native" = the stateful C++ session
        (decode/native.py NativeBeamSession — same algorithm at C++
        speed), "host" = the Python beam_step oracle, "device" = the
        batched DEVICE-RESIDENT incremental beam (the fused Pallas
        kernel carrying per-slot beam state across ticks exactly like
        the RNN carries — decode/device_stream.py; needs a
        kernel-eligible LM, i.e. none or a small word LM), "auto" =
        device, then native, then host — first whose preconditions
        hold."""
        if model_cfg.bidirectional:
            raise ValueError("streaming needs a unidirectional model")
        if decoder not in ("greedy", "beam"):
            raise ValueError(f"decoder must be greedy|beam, got {decoder!r}")
        if beam_impl not in ("auto", "host", "native", "device"):
            raise ValueError(f"beam_impl must be auto|host|native|device, "
                             f"got {beam_impl!r}")
        self.cfg = model_cfg
        self.fe = frontend_cfg
        self.alphabet = alphabet
        self.blank_id = alphabet.blank_id
        self.chunk_frames = chunk_frames
        self.max_streams = max_streams
        self.variables = variables
        self.decoder = decoder
        self._beam_kw = dict(beam_width=beam_width, lm=lm, alpha=alpha,
                             beta=beta, cutoff_top_n=cutoff_top_n,
                             cutoff_prob=cutoff_prob,
                             prune_logp=prune_logp)
        self._step, self._delta, self._d1, self._d2 = _build_step(
            model_cfg, frontend_cfg, chunk_frames
        )
        self._dev_engine = None
        if decoder == "beam" and beam_impl in ("auto", "device"):
            # device-resident incremental beam: per-slot beam state
            # carried across ticks ON DEVICE (no per-stream host
            # session cost). "auto" probes and falls back to the
            # native/host sessions (e.g. on CPU, or an LM too big to
            # fuse in-kernel); an explicit "device" fails loudly.
            try:
                from tpuasr.decode.beam import DeviceBeamDecoder
                from tpuasr.decode.device_stream import DeviceBeamStreams

                dec = DeviceBeamDecoder(
                    alphabet, beam_width=beam_width, word_lm=lm,
                    alpha=alpha, beta=beta, cutoff_top_n=cutoff_top_n,
                    cutoff_prob=cutoff_prob, prune_logp=prune_logp,
                    impl="pallas" if beam_impl == "device" else "auto")
                self._dev_engine = DeviceBeamStreams(
                    dec, max_streams, alphabet.size, self._delta)
                # ONE dispatch per tick: the beam advance rides in the
                # SAME jit as the acoustic step (a separate dispatch
                # measured +70 ms/tick through a tunneled host —
                # bench_runs/r5/08 vs the fused re-run)
                _step, _adv = self._step, self._dev_engine._advance

                @jax.jit
                def step_beam(variables, carry, windows, k, t_f, t1,
                              active, lo, lens, bstate):
                    logits, carry1 = _step(variables, carry, windows,
                                           k, t_f, t1, active)
                    p, c, s, b1 = _adv(logits, lo, lens, bstate)
                    return carry1, p, c, s, b1

                self._step_beam = step_beam
            except Exception:
                if beam_impl == "device":
                    raise
                self._dev_engine = None
        self._mk_native = None if self._dev_engine else \
            _native_session_factory(
                decoder, "auto" if beam_impl == "device" else beam_impl,
                alphabet, self._beam_kw)
        self._lahead = max(model_cfg.lookahead_context - 1, 0)
        init0 = _init_carry(model_cfg, frontend_cfg, max_streams,
                            prime_stats)
        self._carry = init0
        self._slots: list[_StreamSlot | None] = [None] * max_streams

        lstm = model_cfg.rnn_type == "lstm"

        @jax.jit
        def reset_rows(carry, keep):
            """Reset the carry rows where ``keep`` is False to the
            INITIAL carry (zeros, or the prime_stats-seeded template —
            a fresh session must start from the same state a fresh
            transcriber would; same row selection as the step's
            idle-row freeze)."""
            return _carry_rows_select(keep, carry, init0, lstm=lstm)

        self._reset_rows = reset_rows

    # ---- session lifecycle ------------------------------------------------

    def open(self) -> int:
        """Claim a free stream slot; returns its id. Raises RuntimeError
        when all ``max_streams`` slots are live."""
        for i, s in enumerate(self._slots):
            if s is None:
                slot = _StreamSlot()
                slot.last_id = self.blank_id
                if self.decoder == "beam":
                    if self._dev_engine is not None:
                        self._dev_engine.reset_slot(i)
                    elif self._mk_native is not None:
                        slot.native = self._mk_native()
                    else:
                        from tpuasr.decode.beam_host import beam_init

                        slot.beams = beam_init()
                self._slots[i] = slot
                keep = np.ones((self.max_streams,), bool)
                keep[i] = False
                self._carry = self._reset_rows(self._carry,
                                               jnp.asarray(keep))
                return i
        raise RuntimeError(f"all {self.max_streams} stream slots in use")

    def close(self, sid: int) -> None:
        self._slots[sid] = None

    # ---- data plane -------------------------------------------------------

    def feed(self, sid: int, samples: np.ndarray) -> None:
        """Buffer samples for stream ``sid`` (no device work; call
        tick() to advance every stream with a full chunk)."""
        s = self._require(sid)
        if s.closed or s.draining:
            raise RuntimeError("stream is closed; open() a new slot")
        samples = np.asarray(samples, np.float32).reshape(-1)
        s.pending = np.concatenate([s.pending, samples])
        s.n_samples += len(samples)
        s.recent = np.concatenate([s.recent, samples])[
            -(2 * self.fe.hop + 2):]

    def tick(self) -> bool:
        """Run ONE batched step over every stream holding a full chunk.
        Returns False (no device work) when none is ready."""
        hop = self.fe.hop
        s_chunk = self.chunk_frames * hop
        ready = []
        for i, s in enumerate(self._slots):
            if s is None or s.closed:
                continue
            if len(s.pending) < s_chunk and s.draining and s.emitted < s.t1:
                # draining slots self-pad so the shared ticker can drive
                # the drain (serve.finish no longer loops under its
                # lock). The zeros are past t1 -> masked; re-padding
                # after a failed step is a no-op (already == s_chunk).
                s.pending = np.concatenate(
                    [s.pending,
                     np.zeros((s_chunk - len(s.pending),), np.float32)])
            if len(s.pending) >= s_chunk:
                ready.append(i)
        if not ready:
            return False
        S = self.max_streams
        windows = np.zeros((S, s_chunk + hop), np.float32)
        k = np.zeros((S,), np.int32)
        t_f = np.full((S,), self._SENTINEL, np.int32)
        t1 = np.full((S,), self._SENTINEL, np.int32)
        active = np.zeros((S,), bool)
        for i in ready:
            # NO slot mutation before the device step succeeds: a
            # transient step failure (retried by the serving ticker)
            # must not consume audio or desync lead/k/carry
            s = self._slots[i]
            lead = s.lead if s.lead is not None \
                else _first_lead(s.pending[:s_chunk], hop)
            windows[i, :hop] = lead
            windows[i, hop:] = s.pending[:s_chunk]
            k[i] = s.k
            active[i] = True
            if s.draining:
                t_f[i], t1[i] = s.t_f, s.t1
        dev = self._dev_engine if self.decoder == "beam" else None
        if dev is not None:
            # device beam: the per-slot beam advance rides in the SAME
            # dispatch as the acoustic step (logits never leave the
            # device; one tunnel round-trip per tick)
            lo_v = np.zeros((S,), np.int32)
            len_v = np.zeros((S,), np.int32)
            bounds = {}
            for i in ready:
                s = self._slots[i]
                base_w = s.k * self._delta - self._d1 - self._d2 \
                    - self._lahead
                cap = s.t1 if s.draining else self._SENTINEL
                lo = max(0, -base_w)
                hi = min(self._delta, cap - base_w)
                lo_v[i], len_v[i] = lo, max(hi - lo, 0)
                bounds[i] = (base_w, hi)
            out = self._step_beam(
                self.variables, self._carry, jnp.asarray(windows),
                jnp.asarray(k), jnp.asarray(t_f), jnp.asarray(t1),
                jnp.asarray(active), jnp.asarray(lo_v),
                jnp.asarray(len_v), dev.state,
            )
            # fetch BEFORE mutating carry/beam state: a transient
            # transfer failure then leaves the tick fully retryable
            # (same no-mutation-before-success rule as the slots below)
            fetched = jax.device_get(out[1:4])
            self._carry, dev.state = out[0], out[4]
            dev.fold(*fetched, len_v)
            for i in ready:
                s = self._slots[i]
                s.pending = s.pending[s_chunk:]
                s.lead = windows[i, -hop:].copy()
                s.k += 1
                base_w, hi = bounds[i]
                if hi > max(0, -base_w):
                    ids, frames = dev.take_committed(i)
                    if ids:
                        frag = self.alphabet.decode(ids)
                        s.committed = s.committed + tuple(ids)
                        s.offsets.extend(int(f) for f in frames)
                        s.parts.append(frag)
                        s.fresh.append(frag)
                    s.emitted = base_w + hi
            return True
        logits, self._carry = self._step(
            self.variables, self._carry, jnp.asarray(windows),
            jnp.asarray(k), jnp.asarray(t_f), jnp.asarray(t1),
            jnp.asarray(active),
        )
        rows_all = np.asarray(logits)
        for i in ready:
            s = self._slots[i]
            s.pending = s.pending[s_chunk:]
            s.lead = windows[i, -hop:].copy()
            s.k += 1
            base_w = (s.k - 1) * self._delta - self._d1 - self._d2 \
                - self._lahead
            cap = s.t1 if s.draining else self._SENTINEL
            lo = max(0, -base_w)
            hi = min(self._delta, cap - base_w)
            if hi > lo:
                if self.decoder == "beam" and s.native is not None:
                    frag, s.committed, offs = _native_emit(
                        s.native, s.committed, rows_all[i], lo, hi,
                        self.alphabet)
                elif self.decoder == "beam":
                    frag, s.beams, s.committed, offs = _beam_emit(
                        s.beams, s.committed, rows_all[i], lo, hi,
                        self.alphabet, self._beam_kw, base_w=base_w)
                else:
                    frag, s.last_id, offs = _greedy_emit(
                        rows_all[i], lo, hi, s.last_id,
                        self.alphabet.labels, self.blank_id,
                        base_w=base_w)
                s.offsets.extend(offs)
                if frag:
                    s.parts.append(frag)
                    s.fresh.append(frag)
                s.emitted = base_w + hi
        return True

    # ---- results ----------------------------------------------------------

    def text(self, sid: int) -> str:
        return "".join(self._require(sid).parts)

    def offsets(self, sid: int) -> np.ndarray:
        """Per-character conv-frame offsets. Greedy: exact offline
        parity. Beam: commit-time best-alignment frames (frozen like
        the text; replaced wholesale on a flush retraction)."""
        return np.asarray(self._require(sid).offsets, np.int64)

    def take_text(self, sid: int) -> str:
        """Newly finalized text since the last take_text/feed cycle."""
        s = self._require(sid)
        frag = "".join(s.fresh)
        s.fresh = []
        return frag

    def flush(self, sid: int) -> str:
        """End of stream ``sid``: drain its pipeline (other ready
        streams keep advancing on the shared ticks) and return its
        remaining newly-final text. The slot stays readable via
        text()/take_text() until close().

        Decomposed as begin_flush / tick-until-flush_done /
        finalize_flush so a serving layer can let its shared ticker
        drive the drain without holding a service-wide lock through
        every device step (round-3 ADVICE #3)."""
        s = self._require(sid)
        if s.closed:
            return ""
        before = len(s.parts)
        self.begin_flush(sid)
        while not self.flush_done(sid):
            self.tick()
        return self._finalize(s, before)

    def begin_flush(self, sid: int) -> None:
        """Mark end-of-stream: fix t_f/t1 from the samples fed so far
        and queue the reflect-pad tail. Idempotent; subsequent tick()s
        (anyone's — e.g. a serving ticker thread) self-pad and advance
        the drain until flush_done()."""
        s = self._require(sid)
        if s.closed or s.draining:
            return
        hop = self.fe.hop
        s.t_f = 1 + s.n_samples // hop
        s.t1 = (s.t_f - 1) // 2 + 1
        s.draining = True
        tail = _reflect_tail(s.recent, s.n_samples, s.t_f, hop,
                             self.fe.n_fft // 2,
                             4 * self.chunk_frames * hop)
        s.pending = np.concatenate([s.pending, tail])

    def flush_done(self, sid: int) -> bool:
        """True once every frame up to t1 has been emitted (or the
        slot is already finalized)."""
        s = self._require(sid)
        return s.closed or (s.draining and s.emitted >= s.t1)

    def finalize_flush(self, sid: int) -> str:
        """Final decode readout after the drain completed; returns the
        FULL final text. Idempotent once closed."""
        s = self._require(sid)
        if not s.closed:
            self._finalize(s, 0)
        return "".join(s.parts)

    def _finalize(self, s: _StreamSlot, before: int) -> str:
        """Beam final readout + close; returns newly-final text since
        ``before`` (or the full text on a beam retraction, which is
        authoritative)."""
        if self.decoder == "beam":
            committed_text = "".join(s.parts)
            if self._dev_engine is not None:
                sid = self._slots.index(s)
                ids, frames, _ = self._dev_engine.finalize(sid)
                final = self.alphabet.decode([int(x) for x in ids])
                extra = (final[len(committed_text):]
                         if final.startswith(committed_text) else final)
            elif s.native is not None:
                ids, frames, _ = s.native.best_with_frames()
                final = self.alphabet.decode([int(x) for x in ids])
                extra = (final[len(committed_text):]
                         if final.startswith(committed_text) else final)
            else:
                extra, final, frames = _beam_final(
                    s.beams, committed_text, self.alphabet, self._beam_kw)
            if final.startswith(committed_text):
                if extra:
                    s.parts.append(extra)
                    s.fresh.append(extra)
                    s.offsets.extend(int(x) for x in
                                     frames[len(committed_text):])
            else:  # rare retraction: the final text is authoritative
                s.parts = [final]
                s.fresh = [final]
                s.offsets = [int(x) for x in frames]
                s.closed = True
                return final
        s.closed = True
        return "".join(s.parts[before:])

    def _require(self, sid: int) -> _StreamSlot:
        s = self._slots[sid] if 0 <= sid < self.max_streams else None
        if s is None:
            raise KeyError(f"no open stream {sid}")
        return s
