from .droid_net import DroidNet, normalize_images  # noqa: F401
from .weights import load_droid_params, init_params  # noqa: F401
