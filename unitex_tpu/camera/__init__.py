from .conversion import (
    intr_to_proj,
    proj_to_intr,
    c2w_to_w2c,
    get_mvp,
    project,
    unproject,
    discretize,
    undiscretize,
    c2ws_to_rays,
    c2ws_to_ray_matrices,
)
from .generator import (
    generate_intrinsics,
    generate_orbit_views_c2ws,
    generate_box_views_c2ws,
    lookat_to_matrix,
    BOX_VIEW_NAMES,
    FRBLTD_TO_FRTBLD,
    FRTBLD_TO_FRBLTD,
)
from .rotation import (
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    quaternion_to_matrix,
    matrix_to_quaternion,
    axis_angle_to_matrix,
)
