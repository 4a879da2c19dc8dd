from tpuasr.model.ds2 import (
    ModelConfig,
    DeepSpeech2,
    conv_out_lengths,
)
