"""Multi-client streaming-serving load test (HTTP /stream/*).

Measures what OPERATIONS.md's streaming section promises: N concurrent
live clients feeding real-time-paced audio into `cli.serve --streaming`
while we record per-chunk feed latency and end-of-stream drain (close)
latency. Reports sustained x-realtime capacity (audio seconds processed
per wall second across all streams) and p50/p95/p99 latencies.

Run against a server started separately (so the server owns the chip):
    python -m tpuasr.cli.serve --model-path <uni.ckpt> --port 8731 \
        --streaming --max-streams 8 [--stream-norm-stats train.csv]
    python scripts/stream_load_test.py --port 8731 --streams 8 \
        --seconds 30 [--realtime]

Without --realtime, clients feed as fast as the server accepts
(throughput mode — the sustained x-realtime number is the capacity
headline). With it, clients pace feeds at 1x like live microphones and
the latency percentiles are the headline.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.request

import numpy as np


def req(port: int, path: str, data: bytes | None = None,
        timeout: float = 120.0):
    r = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data)
    with urllib.request.urlopen(r, timeout=timeout) as f:
        return json.loads(f.read())


def synth_wave(seconds: float, seed: int, sr: int = 16000) -> np.ndarray:
    """Word-tone-ish audio (tones + noise) so decode does real work."""
    rng = np.random.RandomState(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    w = np.zeros(n, np.float32)
    pos = 0
    while pos < n:
        seg = int(sr * rng.uniform(0.2, 0.5))
        f0 = rng.uniform(120, 600)
        w[pos:pos + seg] += np.sin(
            2 * np.pi * f0 * t[pos:pos + seg]).astype(np.float32) * 0.5
        pos += seg + int(sr * rng.uniform(0.05, 0.2))
    w += 0.02 * rng.randn(n).astype(np.float32)
    return np.clip(w, -1, 1)


def client(port: int, seconds: float, chunk_s: float, seed: int,
           realtime: bool, out: dict):
    sr = 16000
    wave = synth_wave(seconds, seed, sr)
    pcm = (wave * 32767).astype(np.int16).tobytes()
    step = int(chunk_s * sr) * 2  # bytes (int16)
    feed_lat = []
    t_start = time.time()
    sid = req(port, "/stream/open", data=b"")["id"]
    for i in range(0, len(pcm), step):
        if realtime:
            target = t_start + (i // 2) / sr
            delay = target - time.time()
            if delay > 0:
                time.sleep(delay)
        t0 = time.time()
        req(port, f"/stream/{sid}/feed", data=pcm[i:i + step])
        feed_lat.append(time.time() - t0)
    t0 = time.time()
    res = req(port, f"/stream/{sid}/close", data=b"")
    close_lat = time.time() - t0
    out.update(dict(
        audio_s=seconds,
        wall_s=time.time() - t_start,
        feed_lat=feed_lat,
        close_lat=close_lat,
        n_chars=len(res.get("text", "")),
        n_offsets=len(res.get("offsets", []) or []),
    ))


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8731)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=30.0,
                    help="audio seconds per stream")
    ap.add_argument("--chunk-seconds", type=float, default=0.32,
                    help="audio per feed request")
    ap.add_argument("--realtime", action="store_true",
                    help="pace feeds at 1x (latency mode)")
    args = ap.parse_args()

    # wait for the server
    for _ in range(300):
        try:
            req(args.port, "/healthz", timeout=5)
            break
        except Exception:
            time.sleep(1)
    else:
        raise SystemExit("server never came up")

    results = [dict() for _ in range(args.streams)]
    threads = [
        threading.Thread(target=client,
                         args=(args.port, args.seconds, args.chunk_seconds,
                               17 + j, args.realtime, results[j]))
        for j in range(args.streams)
    ]
    t0 = time.time()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.time() - t0

    ok = [r for r in results if r]
    feed_all = [x for r in ok for x in r["feed_lat"]]
    total_audio = sum(r["audio_s"] for r in ok)
    line = {
        "metric": "stream_serving_capacity",
        "streams": args.streams,
        "mode": "realtime" if args.realtime else "throughput",
        "audio_s_total": total_audio,
        "wall_s": round(wall, 2),
        "x_realtime": round(total_audio / wall, 2),
        "feed_p50_ms": round(1e3 * pct(feed_all, 50), 1),
        "feed_p95_ms": round(1e3 * pct(feed_all, 95), 1),
        "feed_p99_ms": round(1e3 * pct(feed_all, 99), 1),
        "close_p95_ms": round(
            1e3 * pct([r["close_lat"] for r in ok], 95), 1),
        "chars_total": sum(r["n_chars"] for r in ok),
        "offsets_total": sum(r["n_offsets"] for r in ok),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
