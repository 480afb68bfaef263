"""Vehicle motion and sensor models with analytic Jacobians."""
from conan_slam_tpu.models import motion, sensor  # noqa: F401
