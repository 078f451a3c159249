from .extract import create_mesh, convert_sdf_samples_to_ply  # noqa: F401
from .grid_eval import eval_sdf_grid, grid_coords  # noqa: F401
from .marching import marching_cubes, marching_tetrahedra  # noqa: F401
from .ply import read_ply, write_ply  # noqa: F401
