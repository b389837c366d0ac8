from .mesh_io import load_mesh, save_mesh, HostMesh
