from . import gaussians  # noqa: F401
from .camera import Camera, make_camera  # noqa: F401
from .mapper import Mapper, map_step, deform_points  # noqa: F401
from .losses import mapping_loss, ssim, psnr, get_median_depth  # noqa: F401
