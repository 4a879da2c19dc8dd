"""Quantify the streaming-vs-offline normalization deviation
(round-3 VERDICT weak #2): train a unidirectional normalize=True
checkpoint, eval a held-out set offline vs streamed vs streamed+primed,
report WER/CER for each + direct offline-vs-stream disagreement."""
import json
import sys

import numpy as np

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuasr.audio.frontend import corpus_feature_stats  # noqa: E402
from tpuasr.audio.io import load_audio  # noqa: E402
from tpuasr.data.manifest import read_manifest  # noqa: E402
from tpuasr.decode.greedy import GreedyDecoder  # noqa: E402
from tpuasr.decode.metrics import cer, wer  # noqa: E402
from tpuasr.stream import StreamingTranscriber  # noqa: E402
from tpuasr.train.checkpoint import load_checkpoint  # noqa: E402
from tpuasr.train.step import make_eval_step  # noqa: E402

# usage: python scripts/norm_deviation_exp.py <ckpt> <val.csv> <train.csv>
# (see PARITY.md "Streaming normalization deviation" for the recipe:
#  train a unidirectional --lookahead-context 5 normalize=True model on
#  a synth_corpus, then run this on the held-out manifest)
CKPT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/normcorp/m/best.ckpt"
VAL = sys.argv[2] if len(sys.argv) > 2 else "/tmp/normcorp/val.csv"
TRAIN = sys.argv[3] if len(sys.argv) > 3 else "/tmp/normcorp/train.csv"

pkg = load_checkpoint(CKPT)
fe = pkg.frontend_config
assert fe.normalize, "experiment needs a normalize=True checkpoint"
variables = jax.device_put({"params": pkg.variables["params"],
                            "batch_stats": pkg.variables["batch_stats"]})
alphabet = pkg.alphabet
eval_step = make_eval_step(pkg.model_config, fe)
greedy = GreedyDecoder(alphabet)

mean, var = corpus_feature_stats(TRAIN, fe)
print(f"corpus stats: mean={mean:.4f} var={var:.4f}", flush=True)

rows = read_manifest(VAL)
res = {k: {"wer": [], "cer": []} for k in
       ("offline", "stream", "stream_primed")}
dis = {"stream": [], "stream_primed": []}

sts = {
    "stream": StreamingTranscriber(variables, pkg.model_config, fe,
                                   alphabet, chunk_frames=16),
    "stream_primed": StreamingTranscriber(
        variables, pkg.model_config, fe, alphabet, chunk_frames=16,
        prime_stats=(mean, var, 500.0)),
}

from tpuasr.data.buckets import BucketSpec  # noqa: E402
from tpuasr.decode.longform import pad_to_ladder  # noqa: E402

spec = BucketSpec(sample_rate=fe.sample_rate)
for i, r in enumerate(rows):
    wave = np.asarray(load_audio(r.wav_path, fe.sample_rate), np.float32)
    ref = r.read_transcript().upper()
    padded, n = pad_to_ladder(wave, spec)
    logits, out_len = eval_step(variables, jnp.asarray(padded[None]),
                                jnp.asarray([n], np.int32))
    off_text = greedy.decode(logits, out_len)[0]
    texts = {"offline": off_text}
    for k, st in sts.items():
        st.reset()
        st.feed(wave)
        st.flush()
        texts[k] = st.text
    for k, t in texts.items():
        res[k]["wer"].append(wer(t, ref))
        res[k]["cer"].append(cer(t, ref))
    for k in dis:
        dis[k].append(cer(texts[k], off_text))
    if i % 8 == 0:
        print(f"[{i}/{len(rows)}] ref={ref!r} off={off_text!r} "
              f"st={texts['stream']!r} pr={texts['stream_primed']!r}",
              flush=True)

out = {}
for k, v in res.items():
    out[k] = {"wer": float(np.mean(v["wer"])),
              "cer": float(np.mean(v["cer"]))}
for k, v in dis.items():
    out[f"{k}_vs_offline_cer"] = float(np.mean(v))
out["n_utts"] = len(rows)
print(json.dumps(out, indent=2))
with open("norm_exp.json", "w") as f:
    json.dump(out, f)
