from .process_image import preprocess_reference_image, get_alpha_bbox
from .rembg import BackgroundRemover, build_background_remover
from .isnet import IsnetConfig, IsnetRemover, init_isnet_params, isnet_forward
from .panorama import cubemap_to_panorama, multi_perspective_to_panorama, perspective_to_panorama
from .color_transfer import color_transfer_sliced_ot, bilateral_filter
