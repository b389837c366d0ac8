from .process_image import preprocess_reference_image, get_alpha_bbox
from .rembg import BackgroundRemover, build_background_remover
