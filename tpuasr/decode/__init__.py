from tpuasr.decode.greedy import GreedyDecoder, greedy_best_path
from tpuasr.decode.metrics import levenshtein, wer, cer
