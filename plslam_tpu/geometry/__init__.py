from . import se3, sim3, projection, lines  # noqa: F401
