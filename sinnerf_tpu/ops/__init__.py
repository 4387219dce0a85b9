from sinnerf_tpu.ops.warp import forward_warp, project_pixels, warp_valid_mask

__all__ = ["forward_warp", "project_pixels", "warp_valid_mask"]
