from cavmd_tpu.io.gsd import GSDFile, GSDWriter, HOOMDTrajectory, open_gsd
from cavmd_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from cavmd_tpu.io.text import TableWriter

__all__ = ["GSDFile", "GSDWriter", "HOOMDTrajectory", "open_gsd", "TableWriter", "save_checkpoint", "load_checkpoint"]
