from .timer import CPUTimer
from .image_io import load_image, save_image, to_uint8, from_uint8
