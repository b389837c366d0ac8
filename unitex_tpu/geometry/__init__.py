from .mesh import (Mesh, PBRMesh, PointCloud, compute_vertex_normals, compute_face_normals,
                   compute_vertex_tangents, laplacian_smooth, laplacian_loss)
from .topology import (get_boundary, get_boundary_tex, get_seams_submesh, dilate_face_mask,
                       unique_edges)
from .sampling import sample_spatial, sample_near_surface, sample_pbr_mesh
