from sinnerf_tpu.models.nerf import (
    export_torch_state,
    import_torch_state,
    init_nerf_params,
    nerf_apply,
)

__all__ = [
    "export_torch_state",
    "import_torch_state",
    "init_nerf_params",
    "nerf_apply",
]
