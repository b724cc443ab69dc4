"""Software-rasterizer geoms: TextLine overlays and comm messages
(reference rendering.py:277-313 TextLine + environment.py:1023-1055
comm-message rendering)."""
import numpy as np

import vectorizedmultiagentsimulator_tpu as vmt
from vectorizedmultiagentsimulator_tpu.render import TextLine, Viewer


def test_textline_rasterizes():
    v = Viewer(200, 100)
    v.geoms.append(TextLine(text="Agent 0 sends [0.12,-0.5]", x=5, y=10))
    frame = v.render(return_rgb_array=True)
    dark = (frame < 128).all(axis=-1).sum()
    assert dark > 50


def test_textline_set_text_and_clip():
    v = Viewer(60, 30)
    t = TextLine(x=-20, y=-3)
    t.set_text("CLIPPED TEXT WIDER THAN CANVAS", font_size=20)
    v.geoms.append(t)
    frame = v.render(return_rgb_array=True)  # must not raise
    assert frame.shape == (30, 60, 3)


def test_comm_messages_rendered():
    env = vmt.make_env("simple_reference", num_envs=2, seed=0)
    env.step(env.get_random_actions())
    frame = env.render(mode="rgb_array", env_index=0)
    assert len(env.text_lines) == sum(
        not a.silent for a in env.world.agents
    )
    assert all("sends" in t.text for t in env.text_lines)
    dark = (frame < 100).all(axis=-1).sum()
    assert dark > 100  # overlay text present in the frame


def test_observer_abc():
    from vectorizedmultiagentsimulator_tpu.utils import Observable, Observer

    class Probe(Observer):
        hits = 0

        def notify(self, observable, *args, **kwargs):
            Probe.hits += 1

    obs = Observable()
    p = Probe()
    obs.subscribe(p)
    obs.notify_observers()
    obs.unsubscribe(p)
    obs.notify_observers()
    assert Probe.hits == 1
