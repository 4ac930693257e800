from .mesh import ROWS_AXIS, make_mesh, replicated, row_sharding, vec_sharding

__all__ = ["ROWS_AXIS", "make_mesh", "replicated", "row_sharding", "vec_sharding"]
