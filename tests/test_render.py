"""Software-rasterizer geoms: TextLine overlays and comm messages
(reference rendering.py:277-313 TextLine + environment.py:1023-1055
comm-message rendering)."""
import math
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


def test_make_ellipse_sector():
    from vectorizedmultiagentsimulator_tpu import render as rendering

    g = rendering.make_circle(radius=0.1, angle=math.pi / 2, filled=True)
    # Partial angle -> polygon wedge closed through the centre.
    assert type(g).__name__ == "Polygon"
    assert g.points[-1] == (0.0, 0.0)
    full = rendering.make_circle(radius=0.1)
    assert type(full).__name__ == "Circle"


def test_x_to_rgb_colormap():
    from vectorizedmultiagentsimulator_tpu.utils import x_to_rgb_colormap

    out = x_to_rgb_colormap(np.linspace(0.0, 1.0, 9), alpha=0.5)
    assert out.shape == (9, 4)
    assert np.allclose(out[:, 3], 0.5)
    assert (out[:, :3] >= 0).all() and (out[:, :3] <= 1).all()


def test_render_agent_indices_and_shooting_overlay():
    env = vmt.make_env(
        "football",
        num_envs=2,
        seed=0,
        n_blue_agents=2,
        n_red_agents=2,
        enable_shooting=True,
    )
    env.step(env.get_random_actions())
    frame = env.render(mode="rgb_array", env_index=0)
    assert frame.std() > 0
    # Index labels: one per blue agent (reds and ball excluded).
    from vectorizedmultiagentsimulator_tpu.utils import ScenarioUtils

    scenario = env.scenario
    geoms = ScenarioUtils.render_agent_indices(
        scenario, 0, start_from=1,
        exclude=scenario.red_agents + [scenario.ball],
    )
    assert len(geoms) == 2
    assert [g.text for g in geoms] == ["1", "2"]


def test_env_plot_function_api():
    """Public plot_function parity (reference environment.py:990-1014):
    builds a heatmap geom over explicit or viewer-derived bounds."""
    env = vmt.make_env("sampling", num_envs=2, seed=0)

    def f(pts):  # [P, 2] -> [P]
        return np.exp(-(pts**2).sum(-1))

    geom = env.plot_function(
        f, precision=0.1, plot_range=((-1, 1), (-1, 1)),
        cmap_range=None, cmap_alpha=0.7, cmap_name="viridis",
    )
    assert geom is not None
    # With plot_range=None the viewer bounds are required: first render
    # to create them, then plot.
    env.render(mode="rgb_array", env_index=0)
    geom2 = env.plot_function(
        f, precision=0.1, plot_range=None,
        cmap_range=None, cmap_alpha=1.0, cmap_name="viridis",
    )
    assert geom2 is not None
