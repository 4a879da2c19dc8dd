from tpuasr.ctc.loss import ctc_loss
