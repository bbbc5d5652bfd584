"""Interactive viewer (SURVEY C5/C26 analog)."""

from .server import ViewerServer, CameraController  # noqa: F401
