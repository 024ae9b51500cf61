from .depth_video import DepthVideo, VideoState  # noqa: F401
from .factor_graph import FactorGraph  # noqa: F401
from .motion_filter import MotionFilter  # noqa: F401
from .frontend import Frontend  # noqa: F401
from .backend import Backend  # noqa: F401
from .trajectory_filler import PoseTrajectoryFiller  # noqa: F401
