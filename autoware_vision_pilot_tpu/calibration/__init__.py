from .camera_pose import (
    get_rotation_matrix,
    undistort_image,
    rotation_homography,
    standardize_pose,
)
from .homography import (
    compute_homography,
    compute_homography_ransac,
    homography_reprojection_error,
    save_homography_yaml,
    load_homography_yaml,
)
