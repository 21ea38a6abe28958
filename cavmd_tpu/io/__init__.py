from cavmd_tpu.io.gsd import GSDFile, GSDWriter, HOOMDTrajectory, open_gsd
from cavmd_tpu.io.text import TableWriter

__all__ = ["GSDFile", "GSDWriter", "HOOMDTrajectory", "open_gsd", "TableWriter"]
