from .mesh import data_parallel_shardings, make_mesh, setup_data_parallel

__all__ = ["make_mesh", "data_parallel_shardings", "setup_data_parallel"]
