from .mesh import MeshContext, make_mesh, make_multihost_mesh  # noqa: F401
