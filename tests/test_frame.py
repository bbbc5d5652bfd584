"""Frame/Application client protocol (C1-C3 parity: Frame.h:6-16,
Application.cpp:44-68) — the formal extension point the round-2 review
found missing."""
import numpy as np

from rtm_tpu.runtime.events import AppClose
from rtm_tpu.runtime.frame import Application, Frame, RenderFrame


def test_custom_frame_lifecycle_and_close():
    calls = []

    class MyFrame(Frame):
        def on_init(self, app):
            calls.append("init")

        def layout(self, app):
            calls.append("layout")
            if len([c for c in calls if c == "update"]) >= 2:
                app.close()

        def update(self, dt_ms):
            calls.append("update")
            assert dt_ms >= 0.0

        def on_shutdown(self):
            calls.append("shutdown")

    app = Application(MyFrame, max_iterations=50)
    n = app.run()
    # close() during layout of iteration 3 is drained at iteration 4
    assert n == 3
    assert calls[0] == "init" and calls[-1] == "shutdown"
    assert calls.count("update") == 3


def test_app_close_event_stops_loop():
    class Idle(Frame):
        pass

    app = Application(Idle, max_iterations=100)
    app.bus.emit(AppClose())
    assert app.run() == 0


def test_render_frame_produces_image():
    app = Application(lambda: RenderFrame(scene_id=5), max_iterations=2)
    app.run()
    img = np.asarray(app.frame.image)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()
