from .mesh import Mesh, PBRMesh, PointCloud, compute_vertex_normals, compute_face_normals
