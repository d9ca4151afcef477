from .distributed import DistVar, allreduce_stats, init_distributed, is_lead_process
from .mesh import data_parallel_shardings, make_mesh, setup_data_parallel

__all__ = [
    "make_mesh",
    "data_parallel_shardings",
    "setup_data_parallel",
    "init_distributed",
    "is_lead_process",
    "allreduce_stats",
    "DistVar",
]
