from .mesh import MeshContext, make_mesh  # noqa: F401
