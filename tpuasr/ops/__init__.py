from tpuasr.ops.gru import bigru_pallas, bigru_reference
