from tpuasr.train.step import TrainConfig, TrainState, make_train_step, make_eval_step
from tpuasr.train.checkpoint import save_checkpoint, load_checkpoint, CheckpointPackage
from tpuasr.train.mesh import make_mesh, shard_batch, replicate
