from sinnerf_tpu.render.renderer import (
    RenderSettings,
    eval_points,
    render_chunked,
    render_rays,
)

__all__ = ["RenderSettings", "eval_points", "render_chunked", "render_rays"]
