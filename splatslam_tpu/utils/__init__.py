from .printer import Printer, FontColor  # noqa: F401
