import jax.numpy as jnp
import numpy as np

from tpuasr.decode.greedy import GreedyDecoder, greedy_best_path
from tpuasr.labels import Alphabet


def logits_for(ids, n_class):
    t = len(ids)
    out = np.full((t, n_class), -5.0, np.float32)
    out[np.arange(t), ids] = 5.0
    return out


def test_collapse_and_blanks():
    a = Alphabet()
    dec = GreedyDecoder(a)
    # blank=0; "AA" needs A,blank,A; repeats collapse
    ca = a.encode("A")[0]
    cb = a.encode("B")[0]
    path = [ca, ca, 0, cb, cb, 0, 0, ca]
    logits = logits_for(path, a.size)[None]
    texts = dec.decode(jnp.asarray(logits), jnp.array([len(path)], jnp.int32))
    assert texts == ["ABA"]


def test_length_masking():
    a = Alphabet()
    dec = GreedyDecoder(a)
    ca = a.encode("A")[0]
    cb = a.encode("B")[0]
    path = [ca, 0, cb, cb]
    logits = logits_for(path, a.size)[None]
    # only first 2 frames valid -> "A"
    texts = dec.decode(jnp.asarray(logits), jnp.array([2], jnp.int32))
    assert texts == ["A"]


def test_offsets():
    a = Alphabet()
    dec = GreedyDecoder(a)
    ca = a.encode("A")[0]
    path = [0, ca, ca, 0]
    logits = logits_for(path, a.size)[None]
    texts, offsets = dec.decode(
        jnp.asarray(logits), jnp.array([4], jnp.int32), return_offsets=True
    )
    assert texts == ["A"]
    assert list(offsets[0]) == [1]
