from . import lie, projective, ba  # noqa: F401
