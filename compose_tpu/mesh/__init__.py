from .cubed_sphere import CubedSphereMesh, build, get_cell_idx  # noqa: F401
