from tpuasr.audio.io import load_audio, save_audio, resample_poly_host
from tpuasr.audio.frontend import (
    FrontendConfig,
    log_spectrogram,
    num_frames,
    make_frontend,
)
